"""1-D ResNet18 encoder/decoder backbones (pure-functional, channels-last).

Re-design of the reference backbones (hippie/backbones.py:6-141) as explicit
parameter/state pytrees + apply functions. The pytree structure mirrors the
torch module tree one-to-one (nested dicts; Sequential indices as string keys)
so the Lightning-checkpoint shim (hippie_tpu/train/checkpoint.py) can map
``encoder.layer1.0.conv1.weight``-style keys mechanically.

Shape contract (verified against torch in tests/test_backbones.py):
  encoder  [B, L, 1]  -> [B, 2*z_dim]      (L=50: 25->25->13->7->4->pool)
  decoder  [B, 2*z_dim] -> [B, out_len]    (1->4->8->16->32->32->64->linear)

Apply functions take ``training`` (static) and an optional per-sample ``mask``
for padded tail batches; they return ``(out, new_state)`` where state carries
the BatchNorm running statistics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hippie_tpu.nn import init as tinit
from hippie_tpu.nn.functional import (
    adaptive_avg_pool_to_1,
    batch_norm,
    batch_norm_init,
    conv1d,
    dense,
    leaky_relu,
    upsample_nearest,
)

# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _split(key, n):
    return list(jax.random.split(key, n))


def _basic_block_enc_init(key, in_planes: int, stride: int):
    """Reference: BasicBlockEnc (backbones.py:19-41); planes = in_planes*stride."""
    planes = in_planes * stride
    ks = _split(key, 3)
    p, s = {}, {}
    p["conv1"] = tinit.conv1d_params(ks[0], 3, in_planes, planes, bias=False)
    p["bn1"], s["bn1"] = batch_norm_init(planes)
    p["conv2"] = tinit.conv1d_params(ks[1], 3, planes, planes, bias=False)
    p["bn2"], s["bn2"] = batch_norm_init(planes)
    if stride != 1:
        p["shortcut"] = {"0": tinit.conv1d_params(ks[2], 1, in_planes, planes, bias=False)}
        bnp, bns = batch_norm_init(planes)
        p["shortcut"]["1"] = bnp
        s["shortcut"] = {"1": bns}
    return p, s


def _resize_conv_init(key, in_ch: int, out_ch: int):
    """Reference: ResizeConv1d (backbones.py:6-16) — nearest x2 then Conv1d k3 p1."""
    return {"conv": tinit.conv1d_params(key, 3, in_ch, out_ch, bias=True)}


def _basic_block_dec_init(key, in_planes: int, stride: int):
    """Reference: BasicBlockDec (backbones.py:44-70); planes = in_planes//stride."""
    planes = in_planes // stride
    ks = _split(key, 3)
    p, s = {}, {}
    p["conv2"] = tinit.conv1d_params(ks[0], 3, in_planes, in_planes, bias=False)
    p["bn2"], s["bn2"] = batch_norm_init(in_planes)
    # Insertion order below mirrors torch registration order (conv1, bn1,
    # shortcut) so the flattened key order matches a Lightning state_dict.
    if stride == 1:
        p["conv1"] = tinit.conv1d_params(ks[1], 3, in_planes, planes, bias=False)
        p["bn1"], s["bn1"] = batch_norm_init(planes)
    else:
        p["conv1"] = _resize_conv_init(ks[1], in_planes, planes)
        p["bn1"], s["bn1"] = batch_norm_init(planes)
        p["shortcut"] = {"0": _resize_conv_init(ks[2], in_planes, planes)}
        bnp, bns = batch_norm_init(planes)
        p["shortcut"]["1"] = bnp
        s["shortcut"] = {"1": bns}
    return p, s


def resnet18_enc_init(key, z_dim: int = 10, nc: int = 1, num_blocks=(2, 2, 2, 2)):
    """Reference: ResNet18Enc.__init__ (backbones.py:73-92)."""
    ks = _split(key, 6)
    p, s = {}, {}
    p["conv1"] = tinit.conv1d_params(ks[0], 3, nc, 64, bias=False)
    p["bn1"], s["bn1"] = batch_norm_init(64)
    in_planes = 64
    for li, (planes, stride) in enumerate(
        zip((64, 128, 256, 512), (1, 2, 2, 2)), start=1
    ):
        strides = [stride] + [1] * (num_blocks[li - 1] - 1)
        lp, ls = {}, {}
        bkeys = _split(ks[li], len(strides))
        for bi, st in enumerate(strides):
            lp[str(bi)], ls[str(bi)] = _basic_block_enc_init(bkeys[bi], in_planes, st)
            in_planes = planes
        p[f"layer{li}"], s[f"layer{li}"] = lp, ls
    p["linear"] = tinit.dense_params(ks[5], 512, 2 * z_dim)
    return p, s


def resnet18_dec_init(key, z_dim: int = 10, output_size: int = 64, nc: int = 1, num_blocks=(2, 2, 2, 2)):
    """Reference: ResNet18Dec.__init__ (backbones.py:106-126).

    Note `_make_layer` iterates reversed(strides) (backbones.py:123): block 0 of
    each stage is stride-1 at the incoming width, block 1 is the stride-2
    upsampler that halves channels.
    """
    ks = _split(key, 7)
    p, s = {}, {}
    p["linear"] = tinit.dense_params(ks[0], 2 * z_dim, 512)
    in_planes = 512
    for idx, (li, planes, stride) in enumerate(
        [(4, 256, 2), (3, 128, 2), (2, 64, 2), (1, 64, 1)]
    ):
        strides = [stride] + [1] * (num_blocks[li - 1] - 1)
        lp, ls = {}, {}
        bkeys = _split(ks[1 + idx], len(strides))
        for bi, st in enumerate(reversed(strides)):
            lp[str(bi)], ls[str(bi)] = _basic_block_dec_init(bkeys[bi], in_planes, st)
            in_planes = in_planes // st
        p[f"layer{li}"], s[f"layer{li}"] = lp, ls
    p["conv1"] = _resize_conv_init(ks[5], 64, nc)
    p["linear_out"] = tinit.dense_params(ks[6], 64, output_size)
    return p, s


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _bn(x, p, s, name, training, mask):
    if name in s:
        y, new = batch_norm(x, p[name], s[name], training=training, mask=mask)
        return y, {name: new}
    raise KeyError(name)


def _basic_block_enc_apply(p, s, x, *, stride: int, training: bool, mask):
    out = conv1d(x, p["conv1"]["weight"], stride=stride, padding=1)
    out, u1 = batch_norm(out, p["bn1"], s["bn1"], training=training, mask=mask)
    out = leaky_relu(out)
    out = conv1d(out, p["conv2"]["weight"], stride=1, padding=1)
    out, u2 = batch_norm(out, p["bn2"], s["bn2"], training=training, mask=mask)
    new_s = {"bn1": u1, "bn2": u2}
    if stride == 1:
        short = x
    else:
        short = conv1d(x, p["shortcut"]["0"]["weight"], stride=stride, padding=0)
        short, u3 = batch_norm(
            short, p["shortcut"]["1"], s["shortcut"]["1"], training=training, mask=mask
        )
        new_s["shortcut"] = {"1": u3}
    out = leaky_relu(out + short)
    return out, new_s


def _resize_conv_apply(p, x, *, scale: int):
    x = upsample_nearest(x, scale)
    return conv1d(x, p["conv"]["weight"], p["conv"]["bias"], stride=1, padding=1)


def _basic_block_dec_apply(p, s, x, *, stride: int, training: bool, mask):
    out = conv1d(x, p["conv2"]["weight"], stride=1, padding=1)
    out, u2 = batch_norm(out, p["bn2"], s["bn2"], training=training, mask=mask)
    out = leaky_relu(out)
    if stride == 1:
        out = conv1d(out, p["conv1"]["weight"], stride=1, padding=1)
    else:
        out = _resize_conv_apply(p["conv1"], out, scale=stride)
    out, u1 = batch_norm(out, p["bn1"], s["bn1"], training=training, mask=mask)
    new_s = {"bn1": u1, "bn2": u2}
    if stride == 1:
        short = x
    else:
        short = _resize_conv_apply(p["shortcut"]["0"], x, scale=stride)
        short, u3 = batch_norm(
            short, p["shortcut"]["1"], s["shortcut"]["1"], training=training, mask=mask
        )
        new_s["shortcut"] = {"1": u3}
    out = leaky_relu(out + short)
    return out, new_s


def _enc_block_stride(bp) -> int:
    """Infer an encoder block's stride from its conv1 kernel: planes =
    in_planes * stride (backbones.py:22), so stride = C_out // C_in."""
    k = bp["conv1"]["weight"]
    return k.shape[2] // k.shape[1]


def _dec_block_stride(bp) -> int:
    """Decoder block stride: planes = in_planes // stride (backbones.py:48).
    A stride!=1 block's conv1 is a ResizeConv1d ({'conv': ...})."""
    if "conv" in bp["conv1"]:
        k = bp["conv1"]["conv"]["weight"]
        return k.shape[1] // k.shape[2]
    return 1


def _block_indices(layer_p) -> list:
    return [str(i) for i in sorted(int(k) for k in layer_p)]


def resnet18_enc_apply(
    p, s, x, *, training: bool = False, mask: Optional[jax.Array] = None,
    backend: str = "xla",
):
    """x: [B, L, nc] -> [B, 2*z_dim]. Reference: ResNet18Enc.forward (backbones.py:94-103).

    Stage structure (block count / strides) is inferred from the parameter
    tree, so shallower variants from ``num_blocks`` overrides work unchanged.
    ``backend='pallas'`` (training mode only) runs every BasicBlock as one
    fused Pallas megakernel (ops/pallas_blocks.py) with bf16 activations;
    ``backend='fused'`` runs the identical fused math (hand-written backward,
    bf16 storage) as plain XLA ops. ``backend='bf16'`` keeps the standard XLA
    ops + autodiff but carries the block-chain activations in bfloat16
    (BatchNorm statistics stay fp32) — the backward's saved residuals are the
    dominant HBM traffic, so halving them is the cheap mixed-precision mode.
    """
    fused = backend in ("pallas", "fused") and training
    bf16 = backend == "bf16" and training
    impl = "xla" if backend == "fused" else "pallas"
    new_s = {}
    out = conv1d(x, p["conv1"]["weight"], stride=2, padding=1)
    out, new_s["bn1"] = batch_norm(out, p["bn1"], s["bn1"], training=training, mask=mask)
    out = leaky_relu(out)
    if bf16:
        out = out.astype(jnp.bfloat16)
    if fused:
        from hippie_tpu.ops import pallas_blocks

        # fused blocks run in [L, B, C] (length leading — see pallas_blocks
        # module docstring); transpose once at the section boundary
        out = jnp.transpose(out, (1, 0, 2)).astype(jnp.bfloat16)
    for li in (1, 2, 3, 4):
        lname = f"layer{li}"
        layer_s = {}
        for bi in _block_indices(p[lname]):
            bp = p[lname][bi]
            if fused:
                out, layer_s[bi] = pallas_blocks.basic_block_enc_fused(
                    bp, s[lname][bi], out, stride=_enc_block_stride(bp), mask=mask,
                    impl=impl,
                )
            else:
                out, layer_s[bi] = _basic_block_enc_apply(
                    bp, s[lname][bi], out, stride=_enc_block_stride(bp), training=training, mask=mask
                )
        new_s[lname] = layer_s
    if fused:
        out = jnp.mean(out.astype(x.dtype), axis=0)  # adaptive pool, L leading
    else:
        if bf16:
            out = out.astype(x.dtype)  # pool + head stay fp32
        out = adaptive_avg_pool_to_1(out)
    out = dense(out, p["linear"]["weight"], p["linear"]["bias"])
    return out, new_s


def resnet18_dec_apply(
    p, s, x, *, training: bool = False, mask: Optional[jax.Array] = None,
    backend: str = "xla",
):
    """x: [B, 2*z_dim] -> [B, out_len]. Reference: ResNet18Dec.forward (backbones.py:128-141)."""
    fused = backend in ("pallas", "fused") and training
    bf16 = backend == "bf16" and training
    impl = "xla" if backend == "fused" else "pallas"
    new_s = {}
    out = dense(x, p["linear"]["weight"], p["linear"]["bias"])  # [B, 512]
    out = out[:, None, :]  # [B, 1, 512] channels-last; torch: [B, 512, 1]
    out = upsample_nearest(out, 4)  # F.interpolate(scale_factor=4), nearest default
    if bf16:
        out = out.astype(jnp.bfloat16)
    if fused:
        from hippie_tpu.ops import pallas_blocks

        out = jnp.transpose(out, (1, 0, 2)).astype(jnp.bfloat16)  # [L, B, C]
    for li in (4, 3, 2, 1):
        lname = f"layer{li}"
        layer_s = {}
        for bi in _block_indices(p[lname]):
            bp = p[lname][bi]
            if fused:
                out, layer_s[bi] = pallas_blocks.basic_block_dec_fused(
                    bp, s[lname][bi], out, stride=_dec_block_stride(bp), mask=mask,
                    impl=impl,
                )
            else:
                out, layer_s[bi] = _basic_block_dec_apply(
                    bp, s[lname][bi], out, stride=_dec_block_stride(bp), training=training, mask=mask
                )
        new_s[lname] = layer_s
    if fused:
        out = jnp.transpose(out, (1, 0, 2)).astype(x.dtype)
    elif bf16:
        out = out.astype(x.dtype)  # final resize-conv + head stay fp32
    out = _resize_conv_apply(p["conv1"], out, scale=2)  # [B, 64, 1]
    out = out.reshape(out.shape[0], -1)  # [B, 64]
    out = dense(out, p["linear_out"]["weight"], p["linear_out"]["bias"])
    return out, new_s
