"""Evaluation: on-device KNN vs sklearn, metrics, z-score, clustering."""

import numpy as np
import jax.numpy as jnp
import pytest

from hippie_tpu.evaluate import knn_eval, metrics
from hippie_tpu.evaluate.embeddings import zscore_rows
from hippie_tpu.ops import clustering


def test_knn_sweep_matches_sklearn():
    from sklearn.neighbors import KNeighborsClassifier

    rng = np.random.default_rng(0)
    xtr = rng.normal(size=(300, 10)).astype(np.float32)
    ytr = rng.integers(0, 4, size=300)
    xte = rng.normal(size=(80, 10)).astype(np.float32)

    ks = list(range(5, 20))
    ours = knn_eval.knn_predict_sweep(xtr, ytr, xte, ks)
    for k in ks:
        sk = KNeighborsClassifier(n_neighbors=k).fit(xtr, ytr).predict(xte)
        np.testing.assert_array_equal(ours[k], sk, err_msg=f"k={k}")


def test_balanced_accuracy_matches_sklearn():
    from sklearn.metrics import balanced_accuracy_score as sk_bas

    rng = np.random.default_rng(1)
    yt = rng.integers(0, 5, size=200)
    yp = rng.integers(0, 5, size=200)
    assert abs(metrics.balanced_accuracy_score(yt, yp) - sk_bas(yt, yp)) < 1e-12


def test_confusion_matrix_matches_sklearn():
    from sklearn.metrics import confusion_matrix as sk_cm

    rng = np.random.default_rng(2)
    yt = rng.integers(0, 4, size=100)
    yp = rng.integers(0, 4, size=100)
    np.testing.assert_array_equal(metrics.confusion_matrix(yt, yp), sk_cm(yt, yp))


def test_zscore_rows_matches_torch_std():
    import torch

    rng = np.random.default_rng(3)
    e = rng.normal(size=(16, 10)).astype(np.float32)
    t = torch.tensor(e)
    expected = ((t - t.mean(dim=1)[:, None]) / t.std(dim=1)[:, None]).numpy()
    got = np.asarray(zscore_rows(jnp.asarray(e)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_kmeans_separates_blobs():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(50, 5)) + 10
    b = rng.normal(size=(50, 5)) - 10
    x = np.concatenate([a, b]).astype(np.float32)
    assign, centers, inertia = clustering.kmeans(x, 2, seed=0)
    assign = np.asarray(assign)
    # perfect split (labels may be swapped)
    assert len(set(assign[:50])) == 1 and len(set(assign[50:])) == 1
    assert assign[0] != assign[-1]
    assert float(inertia) < 1000


def test_gmm_separates_blobs():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(60, 4)) + 6
    b = rng.normal(size=(60, 4)) - 6
    x = np.concatenate([a, b]).astype(np.float32)
    assign, means, var, weights, ll = clustering.gmm(x, 2, iters=30, seed=0)
    assign = np.asarray(assign)
    assert len(set(assign[:60])) == 1 and len(set(assign[60:])) == 1
    assert assign[0] != assign[-1]
    np.testing.assert_allclose(np.asarray(weights).sum(), 1.0, rtol=1e-5)


def test_eval_programs_use_aot_cache(tmp_path):
    """With an AOT default dir set (pipeline --aot-dir), embed_unimodal and
    the KNN sweep run through the executable cache: results identical to the
    plain jit path, entries written once and reused."""
    import os

    import jax

    from hippie_tpu.evaluate import embeddings as emb
    from hippie_tpu.models import cvae
    from hippie_tpu.utils import aot

    cfg = cvae.CVAEConfig(z_dim=4, output_size=50, num_blocks=(1, 1, 1, 1))
    p, s = cvae.unimodal_cvae_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(37, 50)).astype(np.float32)
    src = np.zeros((37,), np.int32)
    tx = rng.normal(size=(60, 8)).astype(np.float32)
    ty = rng.integers(0, 3, size=(60,)).astype(np.int32)
    ex = rng.normal(size=(11, 8)).astype(np.float32)

    assert aot.default_dir() is None
    plain_emb = np.asarray(emb.embed_unimodal(p, s, data, src))
    plain_knn = knn_eval.knn_predict_sweep(tx, ty, ex, ks=range(5, 20, 2))

    d = str(tmp_path / "aot_eval")
    aot.set_default_dir(d)
    try:
        cached_emb = np.asarray(emb.embed_unimodal(p, s, data, src))
        cached_knn = knn_eval.knn_predict_sweep(tx, ty, ex, ks=range(5, 20, 2))
        files = os.listdir(d)
        assert len(files) == 2, files
        mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in files}
        again_emb = np.asarray(emb.embed_unimodal(p, s, data, src))
        again_knn = knn_eval.knn_predict_sweep(tx, ty, ex, ks=range(5, 20, 2))
        assert {f: os.path.getmtime(os.path.join(d, f)) for f in files} == mtimes
    finally:
        aot.set_default_dir(None)

    np.testing.assert_allclose(cached_emb, plain_emb, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(again_emb, plain_emb, rtol=1e-6, atol=1e-7)
    for k in plain_knn:
        np.testing.assert_array_equal(cached_knn[k], plain_knn[k])
        np.testing.assert_array_equal(again_knn[k], plain_knn[k])


def test_aot_cache_key_host_fingerprint(monkeypatch):
    """CPU-backend cache keys fold in the host ISA fingerprint: XLA:CPU
    executables embed machine-specific codegen, and a .jexec written on a
    different container deserializes cleanly but can SIGILL at run time."""
    import jax

    from hippie_tpu.utils import aot

    args = (np.zeros((2, 3), np.float32),)
    k1 = aot.cache_key(args, "fp-test")
    monkeypatch.setattr(aot, "_HOST_FP", "other-machine")
    k2 = aot.cache_key(args, "fp-test")
    if jax.default_backend() == "cpu":
        assert k1 != k2  # foreign-host entries must miss
    else:  # pragma: no cover - tests force CPU
        assert k1 == k2  # device executables: host ISA irrelevant


def test_aot_prune_stale_revisions(tmp_path):
    """Stale-revision entries and old tmp files are pruned when the cache is
    first used; current-revision entries and fresh tmp files survive."""
    import os
    import time

    import jax

    from hippie_tpu.utils import aot

    d = tmp_path / "aot"
    d.mkdir()
    rev = aot.source_revision()[:10]
    keep = d / f"prog_{rev}_aaaa.jexec"
    stale = d / "prog_0000000000_bbbb.jexec"
    fresh_tmp = d / f"prog_{rev}_cccc.jexec.tmp.123"
    old_tmp = d / f"prog_{rev}_dddd.jexec.tmp.456"
    for p in (keep, stale, fresh_tmp, old_tmp):
        p.write_bytes(b"x")
    os.utime(old_tmp, (time.time() - 7200, time.time() - 7200))

    f = jax.jit(lambda x: x + 1)
    aot._PRUNED_DIRS.discard(str(d))
    out = aot.cached_call(f, (np.float32(1.0),), str(d), "prune-test")
    assert float(out) == 2.0
    names = set(os.listdir(d))
    assert keep.name in names            # current revision kept
    assert stale.name not in names       # old revision pruned
    assert fresh_tmp.name in names       # recent tmp (live writer) kept
    assert old_tmp.name not in names     # dead writer's tmp reaped
