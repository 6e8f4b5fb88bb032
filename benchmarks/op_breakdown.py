"""Per-op time breakdown of one MU iteration at the large-batch scale.

Answers "where do the milliseconds go" for the conv strategy on real
hardware: reconstruct, grad_H pair, H ratio, grad_W pair, W ratio, each
measured with the same dispatch-amortized scan methodology as
``benchmarks/pallas_fusion.py``, plus the fused full iteration for
comparison (XLA fuses elementwise work into the convs, so the parts can
legitimately sum to more than the whole).

Usage: python benchmarks/op_breakdown.py [n_samples] [side]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from tnmf_tpu import engine  # noqa: E402
from tnmf_tpu.ops import conv  # noqa: E402
from tnmf_tpu.ops.modes import ConvPlan  # noqa: E402

K_ITERS = 8


def overhead():
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    np.asarray(f(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(step_fn, carry0, ovh):
    @jax.jit
    def loop(c):
        return lax.scan(lambda c, _: (step_fn(c), None), c, None, length=K_ITERS)[0]

    out = loop(carry0)
    jax.tree.map(lambda x: np.asarray(x.reshape(-1)[:1]), out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = loop(carry0)
        jax.tree.map(lambda x: np.asarray(x.reshape(-1)[:1]), out)
        ts.append(time.perf_counter() - t0)
    return (min(ts) - ovh) / K_ITERS


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dtype = jnp.dtype(sys.argv[3]) if len(sys.argv) > 3 else jnp.float32
    S, A, M, C = (side, side), (9, 9), 16, 1
    plan = ConvPlan.create('valid', S, A)
    T = plan.transform_shape
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    V = jax.random.uniform(k1, (n, C) + S, dtype)
    W = jax.random.uniform(k2, (M, C) + A, dtype)
    H = jax.random.uniform(k3, (n, M) + T, dtype)
    Vp = conv.prepare_data(V, plan)
    R = conv.reconstruct(W, H, plan)
    np.asarray(R[0, 0, 0, :1])
    ovh = overhead()
    print(f'device={jax.devices()[0]}, N={n} S={S} A={A} M={M} C={C} {dtype}; '
          f'overhead {ovh*1e3:.1f} ms')

    tA = np.prod(T) * np.prod(A)
    fl_rec = 2 * n * C * M * tA
    fl_gh = 2 * fl_rec   # stacked V/R
    fl_gw = 2 * fl_rec

    def row(name, t, fl):
        print(f'  {name:24s} {t*1e3:8.2f} ms  {fl/t/1e12:6.2f} TF/s')

    t = bench(lambda H: H + 1e-30 * conv.reconstruct(W, H, plan).sum(), H, ovh)
    row('reconstruct', t, fl_rec)
    t = bench(lambda H: H + 1e-30 * sum(g.sum() for g in conv.grad_H_pair(Vp, R, W, plan)), H, ovh)
    row('grad_H pair', t, fl_gh)
    t = bench(lambda H: H + 1e-30 * sum(g.sum() for g in conv.grad_W_pair(Vp, R, H, plan)), H, ovh)
    row('grad_W pair', t, fl_gw)

    neg = jnp.abs(H) + 1
    pos = jnp.abs(H) + 2
    # pass neg/pos through the carry: closure constants of this size blow up
    # the serialized computation (HTTP 413 behind the remote-compile tunnel)
    t = bench(lambda c: (c[0] * c[1] / (c[2] + 1e-9), c[1], c[2]), (H, neg, pos), ovh)
    row('H ratio (elementwise)', t, 0.0 * fl_rec + 1)

    z = jnp.zeros((), dtype)
    statics = dict(plan=plan, strategy='conv', update_H=True, update_W=True,
                   use_inhibition=False, use_cross=False)

    def full(carry):
        W, H = carry
        return engine.update_step(Vp, W, H, z, z, z, (), **statics)

    t = bench(full, (W, H), ovh)
    row('FULL MU iteration', t, fl_rec * 2 + fl_gh + fl_gw)


if __name__ == '__main__':
    main()
