"""Compiled-on-TPU benchmarks of the Pallas kernels vs their XLA paths.

Two kernels are measured with dispatch-amortized methodology:

* ``experimental.pallas_mu.inhibited_mu_h`` — the fused inhibited H-update epilogue
  (separable inhibition field + same/cross-atom terms + MU ratio in one
  VMEM pass) vs the XLA chain (banded-matmul separable conv + elementwise
  ops).  The XLA chain wins ~5x at every measured scale (see also
  benchmarks/large_scale.py), so the model's auto mode runs it and the
  kernel is opt-in.
* ``experimental.pallas_gw.grad_w_gemm`` — the blocked-GEMM W-gradient statistics
  vs the XLA huge-kernel conv (``ops.conv.grad_W_pair``).

Methodology note (important on remote-dispatch platforms): a single
dispatch through the axon TPU tunnel costs ~30 ms of fixed round-trip,
which dwarfs most single ops.  Every measurement here therefore runs the
op K times inside one jitted ``lax.scan`` with a data dependence between
iterations, and subtracts the measured empty-dispatch overhead.  Round-1
per-op numbers taken without this amortization (e.g. the
"grad_W ~1.4 TF/s" floor) were overhead-corrupted; the corrected XLA conv
grad_W runs at ~5.4-8.6 TF/s on the flagship shapes, which is why the
Pallas grad_W kernel (measured ~0.8-1.0x of XLA) stays opt-in.

Usage: python benchmarks/pallas_fusion.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from tnmf_tpu.experimental import pallas_gw, pallas_mu  # noqa: E402
from tnmf_tpu.ops import conv  # noqa: E402
from tnmf_tpu.ops.inhibition import inhibition_kernels, inhibition_positive_term  # noqa: E402
from tnmf_tpu.ops.modes import ConvPlan  # noqa: E402

K_ITERS = 10


def measure_dispatch_overhead():
    """Fixed cost of one tiny dispatch (the axon tunnel round trip)."""
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(step_fn, carry0, overhead, *consts):
    """Amortized per-op time: K_ITERS dependent runs in one scan dispatch.

    ``consts`` are loop-invariant big tensors passed as jit *arguments*
    (closure constants beyond ~100 MB blow the remote-compile body limit).
    """
    @jax.jit
    def loop(c, *k):
        return lax.scan(lambda c, _: (step_fn(c, *k), None), c, None, length=K_ITERS)[0]

    out = loop(carry0, *consts)
    jax.tree.map(lambda x: np.asarray(x.reshape(-1)[:1]), out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = loop(carry0, *consts)
        jax.tree.map(lambda x: np.asarray(x.reshape(-1)[:1]), out)
        ts.append(time.perf_counter() - t0)
    return (min(ts) - overhead) / K_ITERS


def bench_inhibited_mu_h(overhead):
    print('\n== fused inhibited H update (pallas_mu.inhibited_mu_h) ==')
    N, M, X, Y = 16, 16, 128, 128
    ranges = (6, 6)
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.random((N, M, X, Y)), jnp.float32)
    neg = jnp.asarray(rng.random((N, M, X, Y)), jnp.float32)
    pos = jnp.asarray(rng.random((N, M, X, Y)), jnp.float32)
    ks = tuple(jnp.asarray(k, jnp.float32) for k in inhibition_kernels(ranges))
    np.asarray(H[0, 0, 0, :1])

    def xla_step(H):
        term = inhibition_positive_term(H, ks, 2, 0.3, 0.2, M, True, True)
        return H * neg / (pos + term + 1e-9)

    t_xla = bench(xla_step, H, overhead)
    print(f'  XLA chain:    {t_xla*1e3:8.3f} ms')

    if pallas_mu.inhibited_mu_h_supported(H.shape, 2, tuple(k.shape[0] for k in ks), H.dtype):
        def pl_step(H):
            return pallas_mu.inhibited_mu_h(H, neg, pos, ks, 0.3, 0.2, 1e-9,
                                            use_same=True, use_cross=True)
        t_pl = bench(pl_step, H, overhead)
        print(f'  Pallas fused: {t_pl*1e3:8.3f} ms   speedup {t_xla/t_pl:.2f}x')
        return t_xla / t_pl
    print('  Pallas kernel unsupported on this backend (needs TPU)')
    return None


def bench_grad_w(overhead):
    print('\n== W-gradient statistics (pallas_gw.grad_w_gemm) ==')
    S, A, N, C = (256, 256), (7, 7), 64, 3
    plan = ConvPlan.create('valid', S, A)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    V = jax.random.uniform(k1, (N, C) + S, jnp.float32)
    Vp = conv.prepare_data(V, plan)
    results = {}
    for M in (16, 32):
        W0 = jax.random.uniform(k2, (M, C) + A, jnp.float32)
        H = jax.random.uniform(k3, (N, M) + plan.transform_shape, jnp.float32)
        np.asarray(H[0, 0, 0, :1])
        flops = 2 * 2 * N * C * M * np.prod(plan.transform_shape) * np.prod(A)

        # both steps are the real mu_W sub-update (carry = W, full output
        # feeds the next iteration): scalar-sum consumers are unsound here
        # because XLA rewrites sum(conv) algebraically and under-measures
        def mu_w_conv(W, Vp, H):
            R = conv.reconstruct(W, H, plan)
            neg, pos = conv.grad_W_pair(Vp, R, H, plan)
            Wn = W * neg / (pos + 1e-9)
            return Wn / jnp.sum(Wn, axis=(-2, -1), keepdims=True)

        t_conv = bench(mu_w_conv, W0, overhead, Vp, H)
        line = f'  M={M:3d}: XLA conv {t_conv*1e3:7.2f} ms ({flops/t_conv/1e12:5.2f} TF/s*)'
        if pallas_gw.supported(plan, M, 2 * C, jnp.float32):
            def mu_w_pallas(W, Vp, H):
                R = conv.reconstruct(W, H, plan)
                X2 = jnp.concatenate([Vp, conv.extend_data(R, plan)], axis=1)
                neg, pos = pallas_gw.grad_w_gemm(X2, H, plan=plan)
                Wn = W * neg / (pos + 1e-9)
                return Wn / jnp.sum(Wn, axis=(-2, -1), keepdims=True)

            t_pl = bench(mu_w_pallas, W0, overhead, Vp, H)
            line += (f' | Pallas {t_pl*1e3:7.2f} ms ({flops/t_pl/1e12:5.2f} TF/s*)'
                     f' | speedup {t_conv/t_pl:.2f}x')
            results[M] = t_conv / t_pl
        else:
            line += ' | Pallas unsupported on this backend'
        print(line + '   (*grad_W-pair FLOPs over the whole mu_W step)')
    return results


def main():
    print(f'platform: {jax.devices()[0].platform}, device: {jax.devices()[0]}')
    overhead = measure_dispatch_overhead()
    print(f'fixed dispatch overhead: {overhead*1e3:.1f} ms '
          f'(subtracted from all measurements)')
    bench_inhibited_mu_h(overhead)
    bench_grad_w(overhead)


if __name__ == '__main__':
    main()
