"""Lane-fill experiment: space-to-depth packing of the C=64 conv stages.

The round-2/3 profile (RESULTS.md "Performance analysis") pinned the MFU
plateau partly on the C=64 layers half-filling the 128-lane MXU: encoder
layer1 (L=25) / layer2's first conv, and the decoder's wide-L/small-C
blocks (reference shapes hippie/backbones.py:73-141). This script settles
the last unexplored headroom lever: reformulate those convs with the length
axis packed into channels (space-to-depth) so the contraction dimension
fills all 128 lanes, and measure fwd+bwd honestly on the real chip.

Variants per shape (all verified numerically equal to the baseline conv
before timing):

  conv/base       standard lax.conv k3 s1 p1, C->C            (3*L*C^2 MACs)
  conv/packed_k3  [B,L/2,2C] one k3 conv, structured-zero      (6*L*C^2 MACs,
                  [3,2C,2C] weights — full 128-lane contraction, 2x MACs)
  conv/packed_2ph two k2 convs (even/odd output phase) + concat (4*L*C^2 MACs,
                  full contraction lanes, half-filled output lanes)
  conv/full_ref   a C=128 conv at L/2 (what full-fill runs at, calibration)

  block/base      the real BasicBlockEnc fwd+bwd (conv+BN+lrelu x2 + add)
  block/packed    same block entirely in packed space, BN over the 2C packed
                  channels (approximate per-(c,phase) stats — the CHEAPEST
                  possible packed block, an upper bound on the win)

Each variant runs inside one jitted fori_loop; the per-dispatch floor is
calibrated with an empty loop and subtracted; completion is forced by a
scalar fetch (block_until_ready under-waits on the axon platform).

Usage: python scripts/exp_lane_fill.py [--batch 512] [--iters 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pack(x):
    """[B, L, C] -> [B, L/2, 2C] (L must be even): channels [even-pos C | odd-pos C]."""
    B, L, C = x.shape
    return x.reshape(B, L // 2, 2 * C)


def unpack(xp):
    B, T, C2 = xp.shape
    return xp.reshape(B, T * 2, C2 // 2)


def pack_weight_k3(w):
    """[3, C, C_out] standard k3 weight -> [3, 2C, 2C_out] packed-space weight
    (structured zeros) such that conv(pack(x), wp, k3, p1) == pack(conv(x, w, k3, p1))."""
    import jax.numpy as jnp

    K, C, Co = w.shape
    assert K == 3
    wp = jnp.zeros((3, 2 * C, 2 * Co), w.dtype)
    # even output phase (out channels [:Co])
    wp = wp.at[0, C:, :Co].set(w[0])   # x[2t-1] = xp[t-1] odd half
    wp = wp.at[1, :C, :Co].set(w[1])   # x[2t]   = xp[t] even half
    wp = wp.at[1, C:, :Co].set(w[2])   # x[2t+1] = xp[t] odd half
    # odd output phase (out channels [Co:])
    wp = wp.at[1, :C, Co:].set(w[0])   # x[2t]
    wp = wp.at[1, C:, Co:].set(w[1])   # x[2t+1]
    wp = wp.at[2, :C, Co:].set(w[2])   # x[2t+2] = xp[t+1] even half
    return wp


def pack_weight_2phase(w):
    """Two k2 packed weights (even-phase taps {t-1,t}, odd-phase taps {t,t+1})."""
    import jax.numpy as jnp

    K, C, Co = w.shape
    we = jnp.zeros((2, 2 * C, Co), w.dtype)
    we = we.at[0, C:].set(w[0])
    we = we.at[1, :C].set(w[1])
    we = we.at[1, C:].set(w[2])
    wo = jnp.zeros((2, 2 * C, Co), w.dtype)
    wo = wo.at[0, :C].set(w[0])
    wo = wo.at[0, C:].set(w[1])
    wo = wo.at[1, :C].set(w[2])
    return we, wo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--block-iters", type=int, default=500)
    args = ap.parse_args()

    from hippie_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hippie_tpu.models import backbones
    from hippie_tpu.nn.functional import conv1d

    B = args.batch
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].platform}, batch {B}")

    def timed(name, loop_fn, *a, n=args.iters, overhead_ms=0.0):
        fn = jax.jit(loop_fn)
        out = fn(*a)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = float("inf")
        for _rep in range(3):  # best-of-3: the remote tunnel RTT jitters ~ms
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            best = min(best, (time.perf_counter() - t0) * 1e3)
        dt = (best - overhead_ms) / n
        print(f"{name:40s} {dt * 1e3:9.2f} us/iter")
        return dt

    def empty_loop(acc):
        return jax.lax.fori_loop(0, args.iters, lambda i, a: a + 1.0, acc)

    fn = jax.jit(empty_loop)
    _ = float(fn(jnp.float32(0)))
    t0 = time.perf_counter()
    _ = float(fn(jnp.float32(0)))
    floor = (time.perf_counter() - t0) * 1e3
    print(f"dispatch floor: {floor:.1f} ms")

    # ---- shapes under test: (L, C) of the half-lane stages -----------------
    for L, C, label in ((26, 64, "enc layer1 (L=25->26)"),
                        (32, 64, "dec layer4 (L=32)")):
        print(f"\n== {label}: B={B} L={L} C={C} ==")
        x = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(size=(3, C, C)).astype(np.float32) * 0.1)
        xp = pack(x)
        wp = pack_weight_k3(w1)
        we, wo = pack_weight_2phase(w1)

        # correctness: packed formulations reproduce the baseline conv
        base = conv1d(x, w1, stride=1, padding=1)
        got_k3 = unpack(conv1d(xp, wp, stride=1, padding=1))
        np.testing.assert_allclose(np.asarray(got_k3), np.asarray(base),
                                   rtol=1e-4, atol=1e-4)
        oe = conv1d(jnp.pad(xp, ((0, 0), (1, 0), (0, 0))), we, stride=1, padding=0)
        oo = conv1d(jnp.pad(xp, ((0, 0), (0, 1), (0, 0))), wo, stride=1, padding=0)
        got_2ph = unpack(jnp.concatenate([oe, oo], axis=-1))
        np.testing.assert_allclose(np.asarray(got_2ph), np.asarray(base),
                                   rtol=1e-4, atol=1e-4)
        print("packed formulations verified equal to baseline conv")

        def conv_fb_loop(conv_fn):
            # The carry MUST be threaded through the grad (x += eps*dx) or XLA
            # hoists the loop-invariant grad out and we time an empty loop.
            # eps is small enough that x + eps*dx rounds back to x exactly, so
            # every iteration computes on identical values — but the data
            # dependence is real and unhoistable.
            def loop(x, w):
                def closs(x, w):
                    return jnp.sum(conv_fn(x, w) ** 2)

                g = jax.grad(closs, argnums=(0, 1))

                def body(i, carry):
                    x, w, acc = carry
                    dx, dw = g(x, w)
                    return (x + 1e-30 * dx, w + 1e-30 * dw,
                            acc + dx.ravel()[0] + dw.ravel()[0])

                return jax.lax.fori_loop(0, args.iters, body, (x, w, jnp.float32(0)))[2]

            return loop

        timed("conv/base (k3, CxC)",
              conv_fb_loop(lambda x, w: conv1d(x, w, stride=1, padding=1)),
              x, w1, overhead_ms=floor)
        timed("conv/packed_k3 (k3, 2Cx2C zeros)",
              conv_fb_loop(lambda x, w: conv1d(x, w, stride=1, padding=1)),
              xp, wp, overhead_ms=floor)

        def conv_2ph(xp, ws):
            we, wo = ws[..., 0], ws[..., 1]
            oe = conv1d(jnp.pad(xp, ((0, 0), (1, 0), (0, 0))), we, stride=1, padding=0)
            oo = conv1d(jnp.pad(xp, ((0, 0), (0, 1), (0, 0))), wo, stride=1, padding=0)
            return jnp.concatenate([oe, oo], axis=-1)

        timed("conv/packed_2ph (2x k2, 2CxC)",
              conv_fb_loop(conv_2ph), xp, jnp.stack([we, wo], axis=-1),
              overhead_ms=floor)

        x_full = jnp.asarray(rng.normal(size=(B, L // 2, 2 * C)).astype(np.float32))
        w_full = jnp.asarray(rng.normal(size=(3, 2 * C, 2 * C)).astype(np.float32) * 0.1)
        timed("conv/full_ref (k3, 2Cx2C dense @ L/2)",
              conv_fb_loop(lambda x, w: conv1d(x, w, stride=1, padding=1)),
              x_full, w_full, overhead_ms=floor)

        # ---- whole BasicBlock fwd+bwd: baseline vs fully-packed ------------
        import jax.random as jrandom

        from hippie_tpu.models.backbones import _basic_block_enc_apply

        bp, bs = backbones._basic_block_enc_init(jrandom.PRNGKey(0), C, 1)

        def block_loop(x, p):
            def bloss(x, p):
                out, _ = _basic_block_enc_apply(p, bs, x, stride=1, training=True, mask=None)
                return jnp.sum(out ** 2)

            g = jax.grad(bloss, argnums=(0, 1))

            def body(i, carry):
                x, p, acc = carry
                dx, dp = g(x, p)
                x = x + 1e-30 * dx
                p = jax.tree_util.tree_map(lambda a, b: a + 1e-30 * b, p, dp)
                return x, p, acc + dx[0, 0, 0] + dp["conv1"]["weight"][0, 0, 0]

            return jax.lax.fori_loop(0, args.block_iters, body, (x, p, jnp.float32(0)))[2]

        timed("block/base (conv+BN+lrelu x2 + add)", block_loop, x, bp,
              n=args.block_iters, overhead_ms=floor)

        from hippie_tpu.nn.functional import batch_norm, batch_norm_init, leaky_relu

        bn_p1, bn_s1 = batch_norm_init(2 * C)
        bn_p2, bn_s2 = batch_norm_init(2 * C)

        def packed_block_loop(xp, ws):
            def bloss(xp, ws):
                wp1, wp2 = ws
                out = conv1d(xp, wp1, stride=1, padding=1)
                out, _ = batch_norm(out, bn_p1, bn_s1, training=True, mask=None)
                out = leaky_relu(out)
                out = conv1d(out, wp2, stride=1, padding=1)
                out, _ = batch_norm(out, bn_p2, bn_s2, training=True, mask=None)
                return jnp.sum(leaky_relu(out + xp) ** 2)

            g = jax.grad(bloss, argnums=(0, 1))

            def body(i, carry):
                xp, ws, acc = carry
                dx, dw = g(xp, ws)
                xp = xp + 1e-30 * dx
                ws = jax.tree_util.tree_map(lambda a, b: a + 1e-30 * b, ws, dw)
                return xp, ws, acc + dx[0, 0, 0] + dw[0][0, 0, 0]

            return jax.lax.fori_loop(0, args.block_iters, body, (xp, ws, jnp.float32(0)))[2]

        wp2 = pack_weight_k3(jnp.asarray(rng.normal(size=(3, C, C)).astype(np.float32) * 0.1))
        timed("block/packed (all-packed, packed BN)", packed_block_loop,
              xp, (wp, wp2), n=args.block_iters, overhead_ms=floor)


if __name__ == "__main__":
    main()
