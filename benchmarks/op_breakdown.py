"""Per-op time breakdown of one MU iteration at the large-batch scale.

Answers "where do the milliseconds go" for the conv strategy on real
hardware.  Every step is a *real MU sub-update* whose full output feeds the
next iteration's carry: scalar-sum or sliced consumers are NOT used because
XLA algebraically rewrites ``sum(conv(...))`` and windows convolutions
under sliced consumers, silently under-measuring the op (observed up to
"51 TF/s" for a conv that runs at ~14 TF/s when its full output is
consumed).  For the same reason the sub-step times legitimately overlap
(each includes the reconstruction it depends on); the FULL row is the
ground truth the parts explain.

Usage: python benchmarks/op_breakdown.py [n_samples] [side] [dtype]
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


def bench(step_fn, carry0, ovh, *consts):
    """``consts`` are loop-invariant big tensors, passed as jit *arguments*
    (closure constants of this size get serialized into the compile request
    and blow the remote-compile body limit)."""
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
    W0 = jax.random.uniform(k2, (M, C) + A, dtype)
    H0 = jax.random.uniform(k3, (n, M) + T, dtype)
    Vp = conv.prepare_data(V, plan)
    np.asarray(Vp[0, 0, 0, :1])
    ovh = overhead()
    print(f'device={jax.devices()[0]}, N={n} S={S} A={A} M={M} C={C} {dtype}; '
          f'overhead {ovh*1e3:.1f} ms')

    tA = np.prod(T) * np.prod(A)
    fl_rec = 2 * n * C * M * tA
    fl_g = 2 * fl_rec  # stacked V/R pair

    def row(name, t, fl=None):
        tf = f'  {fl/t/1e12:6.2f} TF/s' if fl else ''
        print(f'  {name:34s} {t*1e3:8.2f} ms{tf}')

    eps = jnp.asarray(engine.EPS, dtype)

    # mu_H sub-update: reconstruct + grad_H pair + ratio
    def step_mu_h(H, Vp):
        R = conv.reconstruct(W0, H, plan)
        neg, pos = conv.grad_H_pair(Vp, R, W0, plan)
        return (H * neg / (pos + eps)).astype(dtype)

    # mu_W sub-update: reconstruct + grad_W pair + ratio + normalize
    def step_mu_w(W, Vp, H):
        R = conv.reconstruct(W, H, plan)
        neg, pos = conv.grad_W_pair(Vp, R, H, plan)
        Wn = W * neg / (pos + eps)
        return (Wn / jnp.sum(Wn, axis=(-2, -1), keepdims=True)).astype(dtype)

    t_h = bench(step_mu_h, H0, ovh, Vp)
    row('mu_H (rec + grad_H pair + ratio)', t_h, fl_rec + fl_g)
    t_w = bench(step_mu_w, W0, ovh, Vp, H0)
    row('mu_W (rec + grad_W pair + ratio)', t_w, fl_rec + fl_g)

    z = jnp.zeros((), dtype)
    statics = dict(plan=plan, strategy='conv', update_H=True, update_W=True,
                   use_inhibition=False, use_cross=False)

    def full(carry, Vp):
        W, H = carry
        return engine.update_step(Vp, W, H, z, z, z, (), **statics)

    t = bench(full, (W0, H0), ovh, Vp)
    row('FULL MU iteration', t, 2 * fl_rec + 2 * fl_g)


if __name__ == '__main__':
    main()
