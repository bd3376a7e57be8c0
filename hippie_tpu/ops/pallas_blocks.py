"""Fused ResNet-block Pallas megakernels for the training hot path.

Profiling (scripts/profile_train_step.py) shows the train step is bound by
BatchNorm/elementwise glue in the BACKWARD pass, not by conv FLOPs: at batch
512 the step spends 0.30 ms in forward, 1.21 ms in backward and 0.40 ms in
the optimizer, while the raw convs run at 100-180 TF/s and account for only
~0.4 ms combined. So each BasicBlock (reference semantics: backbones.py:19-41
encoder, 44-70 decoder) is fused into ONE Pallas kernel per direction:

- forward: conv -> BN(train stats) -> LeakyReLU -> conv -> BN -> (+shortcut)
  -> LeakyReLU entirely in VMEM, emitting the block output plus per-BN batch
  statistics (mu, var, inv) for the EMA update and the backward pass;
- backward (custom VJP): ONE kernel that recomputes the forward chain in VMEM
  from the saved block input and statistics, then produces dx and every
  parameter gradient (conv weights, BN gamma/beta) — no intermediate
  activations ever round-trip through HBM.

Layout: activations flow through the fused section as ``[L, B, C]`` (length
LEADING) — every conv tap shift, stride-2 parity split, nearest-x2 upsample
and transposed-conv interleave then manipulates only the leading dim, which
Mosaic handles as whole-slab moves; B stays on (aligned) sublanes and C on
lanes, and the ``[L*B, C]`` matmul views are layout no-ops. The same math
with L in the middle (``[B, L, C]``) forces sublane-granularity relayouts
that Mosaic compiles pathologically (observed: minutes-to-failure vs 8 s).
The caller transposes once at the fused-section boundary (backbones.py).

Numerics: activations are stored bf16 between ops (the MXU multiplies in
bf16 at XLA's default precision anyway); all matmul accumulation, BatchNorm
statistics and normalization run in fp32. Master weights stay fp32; weight
gradients are returned fp32. Masked tail batches keep exact semantics:
statistics and their backward reduction terms use the per-sample mask exactly
like nn.functional.batch_norm.

On non-TPU backends the kernels run in Pallas interpret mode, so the same
code path is testable on CPU (tests/test_pallas_blocks.py checks fwd/bwd
parity against the XLA path and against autodiff of the identical bf16 math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guard
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

_EPS = 1e-5
_SLOPE = 0.01  # backbone LeakyReLU slope (reference backbones.py:37 etc.)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem_spec():
    if _HAVE_PLTPU:
        return pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.BlockSpec()


# ---------------------------------------------------------------------------
# Traced helpers (used INSIDE kernel bodies; all arrays are [L, B, C])
# ---------------------------------------------------------------------------


def _dot2(a, b):
    """[M, K] @ [K, N] -> fp32, bf16 operands on the MXU."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _dotT2(a, b):
    """[K, M]^T @ [K, N] -> fp32 (contract over dim 0 of both)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _pad_l(x, before, after):
    return jnp.pad(x, ((before, after), (0, 0), (0, 0)))


def _even_slabs(x):
    """x[0::2] via leading-dim parity reshape."""
    L, B, C = x.shape
    if L % 2:
        x = _pad_l(x, 0, 1)
        L += 1
    return x.reshape(L // 2, 2, B, C)[:, 0]


def _odd_slabs(x):
    L, B, C = x.shape
    if L % 2:
        x = _pad_l(x, 0, 1)
        L += 1
    return x.reshape(L // 2, 2, B, C)[:, 1]


def _interleave(u, v):
    """[L, B, C] x2 -> [2L, B, C] alternating u0 v0 u1 v1 ..."""
    L, B, C = u.shape
    return jnp.stack([u, v], axis=1).reshape(2 * L, B, C)


def _conv3(x, w, stride: int):
    """k=3 pad=1 conv as 3 tap-matmuls. x [L,B,Ci], w [3,Ci,Co] -> fp32 [Lo,B,Co]."""
    L, B, Ci = x.shape
    Co = w.shape[2]
    xp = _pad_l(x, 1, 1)
    if stride == 1:
        Lo = L
        taps = [xp[t:t + L] for t in range(3)]
    else:
        Lo = (L - 1) // 2 + 1
        ev, od = _even_slabs(xp), _odd_slabs(xp)  # xp slabs 0,2,.. / 1,3,..
        # tap t reads xp slabs t, t+2, ... (Lo of them)
        taps = [ev[:Lo], od[:Lo], ev[1:Lo + 1]]
    acc = _dot2(taps[0].reshape(Lo * B, Ci), w[0])
    acc += _dot2(taps[1].reshape(Lo * B, Ci), w[1])
    acc += _dot2(taps[2].reshape(Lo * B, Ci), w[2])
    return acc.reshape(Lo, B, Co)


def _conv1x1_s2(x, w):
    """k=1 stride=2 pad=0 conv (encoder shortcut). w [1,Ci,Co]."""
    L, B, Ci = x.shape
    Lo = (L - 1) // 2 + 1
    xe = _even_slabs(x)[:Lo]
    return _dot2(xe.reshape(Lo * B, Ci), w[0]).reshape(Lo, B, -1)


def _wT(w):
    """[3,Ci,Co] -> flipped+transposed [3,Co,Ci] (transposed-conv weights)."""
    return jnp.stack([w[2].T, w[1].T, w[0].T])


def _convT3(g, w, stride: int, Lin: int):
    """Transpose of _conv3: g [Lo,B,Co], w [3,Ci,Co] -> fp32 [Lin,B,Ci].

    stride 1 is exactly _conv3 with flipped+transposed weights — one running
    accumulator, no materialized per-tap products (VMEM-critical for C=512).
    """
    Lo, B, Co = g.shape
    Ci = w.shape[1]
    if stride == 1:
        return _conv3(g, _wT(w), 1)
    # stride 2: u_t = g @ w[t]^T contributes to padded positions 2l + t
    gf = g.reshape(Lo * B, Co)
    us = [
        jax.lax.dot_general(
            gf.astype(jnp.bfloat16), w[t].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(Lo, B, Ci)
        for t in range(3)
    ]
    z = jnp.zeros_like(us[0])
    width = 2 * Lo + 2
    out = (
        _pad_l(_interleave(us[0], z), 0, width - 2 * Lo)
        + _pad_l(_interleave(us[1], z), 1, width - 1 - 2 * Lo)
        + _pad_l(_interleave(us[2], z), 2, width - 2 - 2 * Lo)
    )
    return out[1:1 + Lin]


def _convT1x1_s2(g, w, Lin: int):
    """Transpose of _conv1x1_s2. g [Lo,B,Co] -> [Lin,B,Ci]."""
    Lo, B, Co = g.shape
    Ci = w.shape[1]
    u = jax.lax.dot_general(
        g.reshape(Lo * B, Co).astype(jnp.bfloat16), w[0].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(Lo, B, Ci)
    inter = _interleave(u, jnp.zeros_like(u))  # even positions 0,2,...
    if inter.shape[0] < Lin:
        inter = _pad_l(inter, 0, Lin - inter.shape[0])
    return inter[:Lin]


def _dw3(x, dc, stride: int):
    """Weight grad of _conv3: x [L,B,Ci], dc [Lo,B,Co] -> fp32 [3,Ci,Co]."""
    L, B, Ci = x.shape
    Lo, _, Co = dc.shape
    xp = _pad_l(x, 1, 1)
    if stride == 1:
        taps = [xp[t:t + L] for t in range(3)]
    else:
        ev, od = _even_slabs(xp), _odd_slabs(xp)
        taps = [ev[:Lo], od[:Lo], ev[1:Lo + 1]]
    dcf = dc.reshape(Lo * B, Co)
    return jnp.stack(
        [_dotT2(taps[t].reshape(Lo * B, Ci), dcf) for t in range(3)], axis=0
    )


def _dw1x1_s2(x, dc):
    L, B, Ci = x.shape
    Lo, _, Co = dc.shape
    xe = _even_slabs(x)[:Lo]
    return _dotT2(xe.reshape(Lo * B, Ci), dc.reshape(Lo * B, Co))[None]


def _bn_stats(c, mb, n):
    """Masked batch stats over (L, B). c fp32 [L,B,C], mb [1,B,1], n scalar."""
    mean = jnp.sum(c * mb, axis=(0, 1)) / n
    var = jnp.sum(jnp.square(c - mean) * mb, axis=(0, 1)) / n
    inv = jax.lax.rsqrt(var + _EPS)
    return mean, var, inv


def _bn_bwd(dy, xh, gamma, inv, mb, n):
    """Masked BatchNorm backward. Returns (dc, dgamma, dbeta).

    dc_j = gamma*inv*(dy_j - m_j/n*(S1 + xh_j*S2)), S1 = sum(dy), S2 = sum(dy*xh)
    (sums over ALL entries — every output depends on the masked stats).
    """
    dy32 = dy.astype(jnp.float32)
    xh32 = xh.astype(jnp.float32)
    dgamma = jnp.sum(dy32 * xh32, axis=(0, 1))
    dbeta = jnp.sum(dy32, axis=(0, 1))
    dc = (gamma * inv) * (dy32 - (mb / n) * (dbeta + xh32 * dgamma))
    return dc, dgamma, dbeta


def _lrelu(a):
    return jnp.where(a >= 0, a, a * _SLOPE)


def _dlrelu(a):
    return jnp.where(a >= 0, 1.0, _SLOPE)


def _upsample2(x):
    """Nearest x2 along L (reference ResizeConv1d, backbones.py:14)."""
    return _interleave(x, x)


def _dupsample2(g):
    """Backward of _upsample2: sum adjacent pairs."""
    L2, B, C = g.shape
    return g.reshape(L2 // 2, 2, B, C).sum(axis=1)


# ---------------------------------------------------------------------------
# Pure block math (shared by the Pallas kernel bodies and the XLA "fused"
# implementation — identical numerics, same tests)
# ---------------------------------------------------------------------------


def _enc_fwd_math(stride, has_short, x, w1, g1, b1, w2, g2, b2, ws, gs, bs, m):
    mb = m[None, :, :]  # m: [B,1]
    Lo = x.shape[0] if stride == 1 else (x.shape[0] - 1) // 2 + 1
    n = jnp.sum(m) * Lo

    c1 = _conv3(x, w1, stride)
    mu1, var1, inv1 = _bn_stats(c1, mb, n)
    r1 = _lrelu(g1 * ((c1 - mu1) * inv1) + b1).astype(jnp.bfloat16)
    st1 = jnp.stack([mu1, var1, inv1])

    c2 = _conv3(r1, w2, 1)
    mu2, var2, inv2 = _bn_stats(c2, mb, n)
    a2 = g2 * ((c2 - mu2) * inv2) + b2
    st2 = jnp.stack([mu2, var2, inv2])

    if has_short:
        cs = _conv1x1_s2(x, ws)
        mus, vars_, invs = _bn_stats(cs, mb, n)
        ash = gs * ((cs - mus) * invs) + bs
        sts = jnp.stack([mus, vars_, invs])
    else:
        ash = x.astype(jnp.float32)
        sts = jnp.zeros((3, w2.shape[2]), jnp.float32)

    out = _lrelu(a2 + ash).astype(jnp.bfloat16)
    return out, st1, st2, sts


def _enc_bwd_math(stride, has_short, x, w1, g1, b1, w2, g2, b2, ws, gs, bs,
                  m, st1, st2, sts, g):
    mb = m[None, :, :]
    Lo = g.shape[0]
    Lin = x.shape[0]
    n = jnp.sum(m) * Lo

    # Recompute the forward chain from x + saved stats. Every [L,B,C]
    # intermediate is stored bf16; fp32 lives only inside the per-op
    # pipelines and reductions (16 MB VMEM stack limit on the Pallas path).
    mu1, inv1 = st1[0, :], st1[2, :]
    xh1 = ((_conv3(x, w1, stride) - mu1) * inv1).astype(jnp.bfloat16)
    a1 = (g1 * xh1.astype(jnp.float32) + b1).astype(jnp.bfloat16)
    r1 = _lrelu(a1.astype(jnp.float32)).astype(jnp.bfloat16)
    mu2, inv2 = st2[0, :], st2[2, :]
    xh2 = ((_conv3(r1, w2, 1) - mu2) * inv2).astype(jnp.bfloat16)
    a2 = g2 * xh2.astype(jnp.float32) + b2
    if has_short:
        mus, invs = sts[0, :], sts[2, :]
        xhs = ((_conv1x1_s2(x, ws) - mus) * invs).astype(jnp.bfloat16)
        ash = gs * xhs.astype(jnp.float32) + bs
    else:
        ash = x.astype(jnp.float32)

    g0 = (g.astype(jnp.float32) * _dlrelu(a2 + ash)).astype(jnp.bfloat16)

    # main branch
    dc2, dg2, db2 = _bn_bwd(g0, xh2, g2, inv2, mb, n)
    dc2 = dc2.astype(jnp.bfloat16)
    dw2 = _dw3(r1, dc2, 1)
    da1 = (_convT3(dc2, w2, 1, r1.shape[0])
           * _dlrelu(a1.astype(jnp.float32))).astype(jnp.bfloat16)
    dc1, dg1, db1 = _bn_bwd(da1, xh1, g1, inv1, mb, n)
    dc1 = dc1.astype(jnp.bfloat16)
    dw1 = _dw3(x, dc1, stride)
    dx = _convT3(dc1, w1, stride, Lin)

    # shortcut branch
    if has_short:
        dcs, dgs, dbs = _bn_bwd(g0, xhs, gs, invs, mb, n)
        dcs = dcs.astype(jnp.bfloat16)
        dws = _dw1x1_s2(x, dcs)
        dx += _convT1x1_s2(dcs, ws, Lin)
    else:
        dws = jnp.zeros(ws.shape, jnp.float32)
        dgs = jnp.zeros(gs.shape, jnp.float32)
        dbs = jnp.zeros(bs.shape, jnp.float32)
        dx += g0.astype(jnp.float32)

    return (dx.astype(jnp.bfloat16), dw1, dg1, db1, dw2, dg2, db2, dws, dgs, dbs)


def _dec_fwd_math(stride, x, w2, g2, b2, w1, c1b, g1, b1, ws, csb, gs, bs, m):
    has_short = stride != 1
    mb = m[None, :, :]
    Lin = x.shape[0]
    Lo = Lin * stride
    n2 = jnp.sum(m) * Lin  # bn2 normalizes at the input length
    n1 = jnp.sum(m) * Lo

    c2 = _conv3(x, w2, 1)
    mu2, var2, inv2 = _bn_stats(c2, mb, n2)
    r = _lrelu(g2 * ((c2 - mu2) * inv2) + b2).astype(jnp.bfloat16)
    st2 = jnp.stack([mu2, var2, inv2])

    if has_short:
        c1 = _conv3(_upsample2(r), w1, 1) + c1b
    else:
        c1 = _conv3(r, w1, 1)
    mu1, var1, inv1 = _bn_stats(c1, mb, n1)
    a1 = g1 * ((c1 - mu1) * inv1) + b1
    st1 = jnp.stack([mu1, var1, inv1])

    if has_short:
        cs = _conv3(_upsample2(x), ws, 1) + csb
        mus, vars_, invs = _bn_stats(cs, mb, n1)
        ash = gs * ((cs - mus) * invs) + bs
        sts = jnp.stack([mus, vars_, invs])
    else:
        ash = x.astype(jnp.float32)
        sts = jnp.zeros((3, w1.shape[2]), jnp.float32)

    out = _lrelu(a1 + ash).astype(jnp.bfloat16)
    return out, st2, st1, sts


def _dec_bwd_math(stride, x, w2, g2, b2, w1, c1b, g1, b1, ws, csb, gs, bs,
                  m, st2, st1, sts, g):
    has_short = stride != 1
    mb = m[None, :, :]
    Lo = g.shape[0]
    Lin = x.shape[0]
    n2 = jnp.sum(m) * Lin
    n1 = jnp.sum(m) * Lo
    gam2, gam1 = g2, g1

    # Recompute forward; every [L,B,C] intermediate stored bf16.
    mu2, inv2 = st2[0, :], st2[2, :]
    xh2 = ((_conv3(x, w2, 1) - mu2) * inv2).astype(jnp.bfloat16)
    a2 = (gam2 * xh2.astype(jnp.float32) + b2).astype(jnp.bfloat16)
    r = _lrelu(a2.astype(jnp.float32)).astype(jnp.bfloat16)
    mu1, inv1 = st1[0, :], st1[2, :]
    if has_short:
        up_r = _upsample2(r)
        c1 = _conv3(up_r, w1, 1) + c1b
    else:
        c1 = _conv3(r, w1, 1)
    xh1 = ((c1 - mu1) * inv1).astype(jnp.bfloat16)
    a1 = gam1 * xh1.astype(jnp.float32) + b1
    if has_short:
        mus, invs = sts[0, :], sts[2, :]
        up_x = _upsample2(x)
        xhs = ((_conv3(up_x, ws, 1) + csb - mus) * invs).astype(jnp.bfloat16)
        ash = gs * xhs.astype(jnp.float32) + bs
    else:
        ash = x.astype(jnp.float32)

    g0 = (g.astype(jnp.float32) * _dlrelu(a1 + ash)).astype(jnp.bfloat16)

    # bn1 branch
    dc1, dg1, db1 = _bn_bwd(g0, xh1, gam1, inv1, mb, n1)
    dc1 = dc1.astype(jnp.bfloat16)
    if has_short:
        dw1 = _dw3(up_r, dc1, 1)
        dc1b = jnp.sum(dc1.astype(jnp.float32), axis=(0, 1))
        dr = _dupsample2(_convT3(dc1, w1, 1, up_r.shape[0]))
    else:
        dw1 = _dw3(r, dc1, 1)
        dc1b = jnp.zeros(c1b.shape, jnp.float32)
        dr = _convT3(dc1, w1, 1, r.shape[0])

    da2 = (dr * _dlrelu(a2.astype(jnp.float32))).astype(jnp.bfloat16)
    dc2, dg2, db2 = _bn_bwd(da2, xh2, gam2, inv2, mb, n2)
    dc2 = dc2.astype(jnp.bfloat16)
    dw2 = _dw3(x, dc2, 1)
    dx = _convT3(dc2, w2, 1, Lin)

    if has_short:
        dcs, dgs, dbs = _bn_bwd(g0, xhs, gs, invs, mb, n1)
        dcs = dcs.astype(jnp.bfloat16)
        dws = _dw3(up_x, dcs, 1)
        dcsb = jnp.sum(dcs.astype(jnp.float32), axis=(0, 1))
        dx += _dupsample2(_convT3(dcs, ws, 1, up_x.shape[0]))
    else:
        dws = jnp.zeros(ws.shape, jnp.float32)
        dcsb = jnp.zeros(csb.shape, jnp.float32)
        dgs = jnp.zeros(gs.shape, jnp.float32)
        dbs = jnp.zeros(bs.shape, jnp.float32)
        dx += g0.astype(jnp.float32)

    return (dx.astype(jnp.bfloat16), dw2, dg2, db2, dw1, dc1b, dg1, db1,
            dws, dcsb, dgs, dbs)


# ---------------------------------------------------------------------------
# Pallas kernel bodies: thin ref-wrappers around the math
# ---------------------------------------------------------------------------


def _enc_fwd_body(stride: int, has_short: bool):
    def kernel(x_ref, w1_ref, g1_ref, b1_ref, w2_ref, g2_ref, b2_ref,
               ws_ref, gs_ref, bs_ref, m_ref,
               out_ref, st1_ref, st2_ref, sts_ref):
        out, st1, st2, sts = _enc_fwd_math(
            stride, has_short, x_ref[...], w1_ref[...], g1_ref[...], b1_ref[...],
            w2_ref[...], g2_ref[...], b2_ref[...], ws_ref[...], gs_ref[...],
            bs_ref[...], m_ref[...],
        )
        out_ref[...] = out
        st1_ref[...] = st1
        st2_ref[...] = st2
        sts_ref[...] = sts

    return kernel


def _enc_bwd_body(stride: int, has_short: bool):
    def kernel(x_ref, w1_ref, g1_ref, b1_ref, w2_ref, g2_ref, b2_ref,
               ws_ref, gs_ref, bs_ref, m_ref, st1_ref, st2_ref, sts_ref, g_ref,
               dx_ref, dw1_ref, dg1_ref, db1_ref, dw2_ref, dg2_ref, db2_ref,
               dws_ref, dgs_ref, dbs_ref):
        outs = _enc_bwd_math(
            stride, has_short, x_ref[...], w1_ref[...], g1_ref[...], b1_ref[...],
            w2_ref[...], g2_ref[...], b2_ref[...], ws_ref[...], gs_ref[...],
            bs_ref[...], m_ref[...], st1_ref[...], st2_ref[...], sts_ref[...],
            g_ref[...],
        )
        refs = (dx_ref, dw1_ref, dg1_ref, db1_ref, dw2_ref, dg2_ref, db2_ref,
                dws_ref, dgs_ref, dbs_ref)
        for ref, val in zip(refs, outs):
            ref[...] = val

    return kernel


# ---------------------------------------------------------------------------
# Decoder block kernels (reference BasicBlockDec, backbones.py:44-70)
#
# chain: conv2(k3 s1) -> bn2 -> lrelu -> conv1 -> bn1 ; shortcut ; add ; lrelu
# stride 1: conv1 = plain k3 (no bias), shortcut = identity
# stride 2: conv1 = ResizeConv (nearest x2 then k3 WITH bias), shortcut =
#           ResizeConv + bn
# ---------------------------------------------------------------------------


def _dec_fwd_body(stride: int):
    def kernel(x_ref, w2_ref, g2_ref, b2_ref, w1_ref, c1b_ref, g1_ref, b1_ref,
               ws_ref, csb_ref, gs_ref, bs_ref, m_ref,
               out_ref, st2_ref, st1_ref, sts_ref):
        out, st2, st1, sts = _dec_fwd_math(
            stride, x_ref[...], w2_ref[...], g2_ref[...], b2_ref[...],
            w1_ref[...], c1b_ref[...], g1_ref[...], b1_ref[...], ws_ref[...],
            csb_ref[...], gs_ref[...], bs_ref[...], m_ref[...],
        )
        out_ref[...] = out
        st2_ref[...] = st2
        st1_ref[...] = st1
        sts_ref[...] = sts

    return kernel


def _dec_bwd_body(stride: int):
    def kernel(x_ref, w2_ref, g2_ref, b2_ref, w1_ref, c1b_ref, g1_ref, b1_ref,
               ws_ref, csb_ref, gs_ref, bs_ref, m_ref,
               st2_ref, st1_ref, sts_ref, g_ref,
               dx_ref, dw2_ref, dg2_ref, db2_ref, dw1_ref, dc1b_ref,
               dg1_ref, db1_ref, dws_ref, dcsb_ref, dgs_ref, dbs_ref):
        outs = _dec_bwd_math(
            stride, x_ref[...], w2_ref[...], g2_ref[...], b2_ref[...],
            w1_ref[...], c1b_ref[...], g1_ref[...], b1_ref[...], ws_ref[...],
            csb_ref[...], gs_ref[...], bs_ref[...], m_ref[...],
            st2_ref[...], st1_ref[...], sts_ref[...], g_ref[...],
        )
        refs = (dx_ref, dw2_ref, dg2_ref, db2_ref, dw1_ref, dc1b_ref,
                dg1_ref, db1_ref, dws_ref, dcsb_ref, dgs_ref, dbs_ref)
        for ref, val in zip(refs, outs):
            ref[...] = val

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp wrappers (operands in [L, B, C])
# ---------------------------------------------------------------------------


def _f32(c):
    return jax.ShapeDtypeStruct(c, jnp.float32)


def _bf16(c):
    return jax.ShapeDtypeStruct(c, jnp.bfloat16)


@functools.lru_cache(maxsize=None)
def _enc_block_prim(stride: int, has_short: bool, impl: str = "pallas"):
    """custom_vjp'd fused encoder block for a static (stride, shortcut) combo.

    Signature: f(x_bf [L,B,Ci], w1, g1, b1, w2, g2, b2, ws, gs, bs, mask[B,1])
    -> (out_bf [Lo,B,Co], st1 [3,Cm], st2 [3,Co], sts [3,Co]) where st* rows
    are (mu, var, inv). ws/gs/bs are dummy zeros when has_short is False.

    ``impl='pallas'`` runs the whole block as one Mosaic kernel per direction;
    ``impl='xla'`` runs the IDENTICAL math (incl. the hand-written backward
    and bf16 storage) as plain XLA ops — same numerics, same tests, no Mosaic
    compile cost or VMEM stack limits.
    """

    def run_fwd(x, w1, g1, b1, w2, g2, b2, ws, gs, bs, mask):
        L, B, Ci = x.shape
        Cm, Co = w1.shape[2], w2.shape[2]
        Lo = L if stride == 1 else (L - 1) // 2 + 1
        if impl == "xla":
            return _enc_fwd_math(
                stride, has_short, x, w1.astype(jnp.bfloat16), g1, b1,
                w2.astype(jnp.bfloat16), g2, b2, ws.astype(jnp.bfloat16),
                gs, bs, mask,
            )
        outs = pl.pallas_call(
            _enc_fwd_body(stride, has_short),
            out_shape=(_bf16((Lo, B, Co)), _f32((3, Cm)), _f32((3, Co)), _f32((3, Co))),
            in_specs=[_vmem_spec()] * 11,
            out_specs=tuple([_vmem_spec()] * 4),
            interpret=_interpret(),
        )(x, w1.astype(jnp.bfloat16), g1, b1, w2.astype(jnp.bfloat16), g2, b2,
          ws.astype(jnp.bfloat16), gs, bs, mask)
        return outs

    @jax.custom_vjp
    def f(x, w1, g1, b1, w2, g2, b2, ws, gs, bs, mask):
        return run_fwd(x, w1, g1, b1, w2, g2, b2, ws, gs, bs, mask)

    def fwd(x, w1, g1, b1, w2, g2, b2, ws, gs, bs, mask):
        outs = run_fwd(x, w1, g1, b1, w2, g2, b2, ws, gs, bs, mask)
        out, st1, st2, sts = outs
        res = (x, w1, g1, b1, w2, g2, b2, ws, gs, bs, mask, st1, st2, sts)
        return outs, res

    def bwd(res, gs_out):
        x, w1, g1, b1, w2, g2, b2, ws, gsc, bs, mask, st1, st2, sts = res
        g = gs_out[0]  # stats outputs carry no meaningful cotangent
        if impl == "xla":
            grads = _enc_bwd_math(
                stride, has_short, x, w1.astype(jnp.bfloat16), g1, b1,
                w2.astype(jnp.bfloat16), g2, b2, ws.astype(jnp.bfloat16),
                gsc, bs, mask, st1, st2, sts, g.astype(jnp.bfloat16),
            )
            dx, dw1, dg1, db1, dw2, dg2, db2, dws, dgs, dbs = grads
            return (dx, dw1, dg1, db1, dw2, dg2, db2, dws, dgs, dbs,
                    jnp.zeros_like(mask))
        grads = pl.pallas_call(
            _enc_bwd_body(stride, has_short),
            out_shape=(
                _bf16(x.shape), _f32(w1.shape), _f32(g1.shape), _f32(b1.shape),
                _f32(w2.shape), _f32(g2.shape), _f32(b2.shape),
                _f32(ws.shape), _f32(gsc.shape), _f32(bs.shape),
            ),
            in_specs=[_vmem_spec()] * 15,
            out_specs=tuple([_vmem_spec()] * 10),
            interpret=_interpret(),
        )(x, w1.astype(jnp.bfloat16), g1, b1, w2.astype(jnp.bfloat16), g2, b2,
          ws.astype(jnp.bfloat16), gsc, bs, mask, st1, st2, sts,
          g.astype(jnp.bfloat16))
        dx, dw1, dg1, db1, dw2, dg2, db2, dws, dgs, dbs = grads
        return (dx, dw1, dg1, db1, dw2, dg2, db2, dws, dgs, dbs,
                jnp.zeros_like(mask))

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=None)
def _dec_block_prim(stride: int, impl: str = "pallas"):
    """Fused decoder block. Signature: f(x_bf [L,B,Ci], w2, g2, b2, w1, c1b,
    g1, b1, ws, csb, gs, bs, mask[B,1]) -> (out_bf [Lo,B,Co], st2, st1, sts).
    ``impl`` as in _enc_block_prim."""
    has_short = stride != 1

    def run_fwd(x, w2, g2, b2, w1, c1b, g1, b1, ws, csb, gs, bs, mask):
        L, B, Ci = x.shape
        Cm, Co = w2.shape[2], w1.shape[2]
        Lo = L * stride
        if impl == "xla":
            return _dec_fwd_math(
                stride, x, w2.astype(jnp.bfloat16), g2, b2,
                w1.astype(jnp.bfloat16), c1b, g1, b1, ws.astype(jnp.bfloat16),
                csb, gs, bs, mask,
            )
        outs = pl.pallas_call(
            _dec_fwd_body(stride),
            out_shape=(_bf16((Lo, B, Co)), _f32((3, Cm)), _f32((3, Co)), _f32((3, Co))),
            in_specs=[_vmem_spec()] * 13,
            out_specs=tuple([_vmem_spec()] * 4),
            interpret=_interpret(),
        )(x, w2.astype(jnp.bfloat16), g2, b2, w1.astype(jnp.bfloat16), c1b, g1, b1,
          ws.astype(jnp.bfloat16), csb, gs, bs, mask)
        return outs

    @jax.custom_vjp
    def f(x, w2, g2, b2, w1, c1b, g1, b1, ws, csb, gs, bs, mask):
        return run_fwd(x, w2, g2, b2, w1, c1b, g1, b1, ws, csb, gs, bs, mask)

    def fwd(*args):
        outs = run_fwd(*args)
        return outs, args + (outs[1], outs[2], outs[3])

    def bwd(res, gs_out):
        (x, w2, g2, b2, w1, c1b, g1, b1, ws, csb, gsc, bs, mask,
         st2, st1, sts) = res
        g = gs_out[0]
        if impl == "xla":
            grads = _dec_bwd_math(
                stride, x, w2.astype(jnp.bfloat16), g2, b2,
                w1.astype(jnp.bfloat16), c1b, g1, b1, ws.astype(jnp.bfloat16),
                csb, gsc, bs, mask, st2, st1, sts, g.astype(jnp.bfloat16),
            )
            (dx, dw2, dg2, db2, dw1, dc1b, dg1, db1, dws, dcsb, dgs, dbs) = grads
            return (dx, dw2, dg2, db2, dw1, dc1b, dg1, db1, dws, dcsb, dgs, dbs,
                    jnp.zeros_like(mask))
        grads = pl.pallas_call(
            _dec_bwd_body(stride),
            out_shape=(
                _bf16(x.shape), _f32(w2.shape), _f32(g2.shape), _f32(b2.shape),
                _f32(w1.shape), _f32(c1b.shape), _f32(g1.shape), _f32(b1.shape),
                _f32(ws.shape), _f32(csb.shape), _f32(gsc.shape), _f32(bs.shape),
            ),
            in_specs=[_vmem_spec()] * 17,
            out_specs=tuple([_vmem_spec()] * 12),
            interpret=_interpret(),
        )(x, w2.astype(jnp.bfloat16), g2, b2, w1.astype(jnp.bfloat16), c1b, g1, b1,
          ws.astype(jnp.bfloat16), csb, gsc, bs, mask, st2, st1, sts,
          g.astype(jnp.bfloat16))
        (dx, dw2, dg2, db2, dw1, dc1b, dg1, db1, dws, dcsb, dgs, dbs) = grads
        return (dx, dw2, dg2, db2, dw1, dc1b, dg1, db1, dws, dcsb, dgs, dbs,
                jnp.zeros_like(mask))

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# Public block-apply wrappers. Contract matches backbones._basic_block_*_apply
# but activations are bf16 [L, B, C]; the caller transposes once at the fused
# section boundary.
# ---------------------------------------------------------------------------


def _ema(state, mu, var, n):
    """torch running-stat update: biased var normalizes, unbiased var EMAs."""
    momentum = 0.1
    unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
    return {
        "running_mean": (1 - momentum) * state["running_mean"] + momentum * mu,
        "running_var": (1 - momentum) * state["running_var"] + momentum * unbiased,
        "num_batches_tracked": state["num_batches_tracked"] + 1,
    }


def _mask_col(x_lbc, mask):
    B = x_lbc.shape[1]
    if mask is None:
        return jnp.ones((B, 1), jnp.float32)
    return mask.astype(jnp.float32).reshape(B, 1)


def basic_block_enc_fused(p, s, x, *, stride: int, mask=None, impl: str = "pallas"):
    """Training-mode fused BasicBlockEnc. x: bf16 [L,B,C]. Returns (out, new_s)."""
    mc = _mask_col(x, mask)
    has_short = stride != 1
    if has_short:
        ws = p["shortcut"]["0"]["weight"]
        gs, bs = p["shortcut"]["1"]["weight"], p["shortcut"]["1"]["bias"]
    else:
        co = p["conv2"]["weight"].shape[2]
        ws = jnp.zeros((1, x.shape[2], co), jnp.float32)
        gs = jnp.zeros((co,), jnp.float32)
        bs = jnp.zeros((co,), jnp.float32)
    out, st1, st2, sts = _enc_block_prim(stride, has_short, impl)(
        x, p["conv1"]["weight"], p["bn1"]["weight"], p["bn1"]["bias"],
        p["conv2"]["weight"], p["bn2"]["weight"], p["bn2"]["bias"],
        ws, gs, bs, mc,
    )
    Lo = out.shape[0]
    n = jnp.sum(mc) * Lo
    new_s = {
        "bn1": _ema(s["bn1"], st1[0], st1[1], n),
        "bn2": _ema(s["bn2"], st2[0], st2[1], n),
    }
    if has_short:
        new_s["shortcut"] = {"1": _ema(s["shortcut"]["1"], sts[0], sts[1], n)}
    return out, new_s


def basic_block_dec_fused(p, s, x, *, stride: int, mask=None, impl: str = "pallas"):
    """Training-mode fused BasicBlockDec. x: bf16 [L,B,C]. Returns (out, new_s)."""
    mc = _mask_col(x, mask)
    has_short = stride != 1
    ci = x.shape[2]
    if has_short:
        w1 = p["conv1"]["conv"]["weight"]
        c1b = p["conv1"]["conv"]["bias"]
        ws = p["shortcut"]["0"]["conv"]["weight"]
        csb = p["shortcut"]["0"]["conv"]["bias"]
        gs = p["shortcut"]["1"]["weight"]
        bs = p["shortcut"]["1"]["bias"]
    else:
        w1 = p["conv1"]["weight"]
        co = w1.shape[2]
        c1b = jnp.zeros((co,), jnp.float32)
        ws = jnp.zeros((3, ci, co), jnp.float32)
        csb = jnp.zeros((co,), jnp.float32)
        gs = jnp.zeros((co,), jnp.float32)
        bs = jnp.zeros((co,), jnp.float32)
    out, st2, st1, sts = _dec_block_prim(stride, impl)(
        x, p["conv2"]["weight"], p["bn2"]["weight"], p["bn2"]["bias"],
        w1, c1b, p["bn1"]["weight"], p["bn1"]["bias"],
        ws, csb, gs, bs, mc,
    )
    Lin, Lo = x.shape[0], out.shape[0]
    n2 = jnp.sum(mc) * Lin
    n1 = jnp.sum(mc) * Lo
    new_s = {
        "bn1": _ema(s["bn1"], st1[0], st1[1], n1),
        "bn2": _ema(s["bn2"], st2[0], st2[1], n2),
    }
    if has_short:
        new_s["shortcut"] = {"1": _ema(s["shortcut"]["1"], sts[0], sts[1], n1)}
    return out, new_s
