"""Preprocessing parity: on-device pipeline vs the reference's per-item path."""

import jax.numpy as jnp
import numpy as np
import pytest

from hippie_tpu.ops import preprocess, resample


@pytest.mark.parametrize("ds", ["cellexplorer-celltype", "extracellular-mouse-a1"])
def test_preprocess_matches_reference(goldens_dir, ds):
    gold = np.load(goldens_dir / f"preprocess_{ds}.npz")
    wave = preprocess.preprocess_waveforms(gold["raw_wf"], normalize=False)
    isi = preprocess.preprocess_isi(gold["raw_isi"], normalize=False)
    np.testing.assert_allclose(np.asarray(wave), gold["wave_norm0"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(isi), gold["isi_norm0"], rtol=1e-5, atol=1e-5)


def test_resample_matches_torch_interpolate():
    """Exact coefficients of F.interpolate(mode='linear', align_corners=False)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for in_len, out_len in [(47, 50), (40, 50), (100, 100), (51, 100), (352, 50), (10, 100)]:
        x = rng.normal(size=(8, in_len)).astype(np.float32)
        expected = (
            F.interpolate(torch.tensor(x)[:, None, :], size=(out_len,), mode="linear")
            .squeeze(1)
            .numpy()
        )
        got = np.asarray(resample.resample_linear(jnp.asarray(x), out_len))
        # matmul accumulation order differs from torch's two-tap formula;
        # residual is pure fp32 rounding (~2 ulp at these magnitudes).
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=5e-6)


def test_normalize_paths():
    """normalize=True semantics: waveform min-max to [-1,1]; ISI z-score (unbiased).

    The reference's normalize=True branch crashes under numpy>=2
    (dataloading.py:84, np.min on a torch tensor) and is unused by shipped
    scripts; we implement its documented intent and verify against a direct
    derivation.
    """
    rng = np.random.default_rng(1)
    wf = rng.normal(size=(4, 40)).astype(np.float32)
    isi = np.abs(rng.normal(size=(4, 80))).astype(np.float32)

    wave = np.asarray(preprocess.preprocess_waveforms(wf, normalize=True))
    mn, mx = wf.min(axis=1, keepdims=True), wf.max(axis=1, keepdims=True)
    expect_pre = ((wf - mn) / (mx - mn)) * 2 - 1
    R = resample.interp_matrix(40, 50)
    np.testing.assert_allclose(wave, expect_pre @ R, rtol=1e-5, atol=1e-6)

    got_isi = np.asarray(preprocess.preprocess_isi(isi, normalize=True))
    li = np.log(isi + 1)
    z = (li - li.mean(axis=1, keepdims=True)) / li.std(axis=1, ddof=1, keepdims=True)
    R = resample.interp_matrix(80, 100)
    np.testing.assert_allclose(got_isi, z @ R, rtol=1e-4, atol=1e-5)


def test_interp_matrix_rows_sum_to_one():
    for in_len, out_len in [(47, 50), (10, 100), (352, 50)]:
        R = resample.interp_matrix(in_len, out_len)
        np.testing.assert_allclose(R.sum(axis=0), np.ones(out_len), rtol=1e-6)


@pytest.mark.parametrize("normalize", [False, True])
def test_preprocess_pair_padded_matches_exact(normalize):
    """The serving width-agnostic program (zero-padded rows + traced resample
    coefficients + masked normalize stats) must agree with the exact-width
    preprocess_pair for every raw width under the caps — this is what lets
    the serving warmup ladder cover first requests of ANY raw width with one
    compiled program per row bucket."""
    import jax.numpy as jnp

    w_cap, i_cap = 64, 128
    rng = np.random.default_rng(7)
    for w_raw, i_raw in [(41, 91), (46, 100), (50, 80), (64, 128)]:
        wf = rng.normal(size=(6, w_raw)).astype(np.float32)
        isi = np.abs(rng.normal(size=(6, i_raw))).astype(np.float32)
        want_w, want_i = preprocess.preprocess_pair(
            jnp.asarray(wf), jnp.asarray(isi), normalize=normalize)

        wf_p = np.zeros((6, w_cap), np.float32)
        isi_p = np.zeros((6, i_cap), np.float32)
        wf_p[:, :w_raw], isi_p[:, :i_raw] = wf, isi
        got_w, got_i = preprocess.preprocess_pair_padded(
            jnp.asarray(wf_p), jnp.asarray(isi_p),
            jnp.asarray(resample.padded_interp_matrix(w_raw, 50, w_cap)),
            jnp.asarray(resample.padded_interp_matrix(i_raw, 100, i_cap)),
            jnp.int32(w_raw), jnp.int32(i_raw), normalize=normalize,
        )
        # reduction-tree order differs (padded width axis): fp32 rounding only
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                                   rtol=1e-5, atol=1e-5)


def test_padded_interp_matrix_validates_cap():
    with pytest.raises(ValueError):
        resample.padded_interp_matrix(100, 50, 64)
