"""The 3-stage HIPPIE pipeline: pretrain -> unsupervised fine-tune -> supervised.

Re-design of scripts/train_model.py (unimodal, two models) and the multimodal
branch of scripts/train_model_with_multimodal.py:618-971 as a library driver
on top of the epoch-as-scan training stack. Output filenames, CSV schemas and
checkpoint contracts match the reference; faithfulness notes:

  - leave-target-out pool assembly incl. quirk Q2 default (registry.pretrain_pool);
  - grad-clip asymmetry (quirk Q7): unimodal wave trainer unclipped in stages
    1-2, time trainer clipped; both clipped in stage 3; multimodal always
    clipped;
  - beta: the unimodal wrappers are constructed without beta (quirk Q6 — beta
    stays 1 regardless of --beta); multimodal gets cfg.beta;
  - stage-2 keeps the ModelCheckpoint callback from stage 1 (train_model.py:
    214-233): best-ckpt tracking carries ACROSS stages 1-2, so stage 3 may
    load a stage-1 checkpoint if fine-tuning never improved val_loss;
  - unimodal stage-2 embeddings come from the last-epoch model on the
    fine-tune train split (train_model.py:235-237); multimodal reloads the
    best ckpt and embeds the fine-tune *test* split (…multimodal.py:773-777);
  - stage 3 rebuilds models with num_classes from the training split, loads
    the cross-stage best ckpt minus class_embedding (quirk Q10), balanced-
    oversampled batches, lr/10.

RNG: torch's global-generator splits cannot be bit-matched; all splits and
shuffles derive from jax.random with the --seed flag (default 42).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from hippie_tpu.data import device_data, registry, sampling
from hippie_tpu.data.device_data import ArrayDataset, batch_plan, train_val_split
from hippie_tpu.evaluate import embeddings as emb
from hippie_tpu.evaluate import knn_eval, metrics
from hippie_tpu.models import cvae
from hippie_tpu.ops import preprocess
from hippie_tpu.train import checkpoint as ckpt_mod
from hippie_tpu.train import loop, optim, step
from hippie_tpu.utils import aot
from hippie_tpu.utils.profiling import StageTimer, trace


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass
class PipelineConfig:
    """Mirrors the reference CLI flags (train_model.py:20-42 + multimodal)."""

    z_dim: int = 5
    weight_decay: float = 0.01
    learning_rate: float = 0.001
    beta: float = 1.0
    dataset: str = "cellexplorer-celltype"
    finetune_without_labels: bool = True
    pretrain_max_epochs: int = 1
    finetune_max_epochs: int = 1
    supervised_max_epochs: int = 1
    batch_size: int = 512
    supervised_batch_size: int = 64
    early_stopping_patience: int = 30
    gradient_clip_val: float = 1.0
    train_val_split: float = 0.8
    finetune_split: float = 0.1
    limit_train_batches: Optional[float] = None
    limit_val_batches: Optional[float] = None
    model_type: str = "unimodal"  # or "multimodal"
    mod1_weight: float = 1.0
    mod2_weight: float = 1.0
    data_root: str = "datasets"
    output_dir: str = "."
    checkpoint_dir: str = "checkpoints"
    seed: int = 42
    class_hidden_dim: int = 5
    num_blocks: tuple = (2, 2, 2, 2)  # backbone depth; (2,2,2,2) = ResNet18
    strict_leakage_guard: bool = False
    # Register custom dataset directories found under data_root (any dir with
    # waveforms.csv + isi_dist.csv; registry.discover_datasets) so they join
    # the leave-target-out pretraining pool with fresh source IDs.
    discover_datasets: bool = False
    verbose: bool = True
    log_fn: Any = None  # optional callable(dict)
    profile_dir: Optional[str] = None  # jax.profiler trace output (optional)
    resume: bool = False  # orbax mid-run resume per stage (see train/orbax_io.py)
    # Opt-in fixes to reference defects (SURVEY.md §7.4 replicate-or-fix):
    drop_index_column: bool = False  # drop the CSV index feature (quirk Q4)
    honest_eval: bool = False  # stage-3 embeddings WITHOUT class conditioning
    # Compute backend for the VAE loss inside every train/eval step:
    # "xla" (default) or "pallas" (hand-fused kernel, ops/pallas_ops.py).
    loss_backend: str = "xla"
    # Backbone block backend for TRAINING steps: "xla" (default, torch-exact),
    # "bf16" (standard ops, bfloat16 block activations, fp32 BN stats), or
    # "fused"/"pallas" (hand-written fused BasicBlock fwd/bwd,
    # ops/pallas_blocks.py). Non-"xla" modes are fast paths, not bit-identical
    # to the torch goldens.
    block_backend: str = "xla"
    # Optimizer moment storage dtype (None = fp32 torch-exact; "bfloat16"
    # halves the bandwidth-bound optimizer state traffic, ~10% of the step).
    opt_state_dtype: Optional[str] = None
    # Data-parallel training over the first N devices of a jax.sharding.Mesh:
    # params/data replicated, batch plans sharded on the batch axis, gradient
    # all-reduce inserted by GSPMD. None = single-device.
    dp_devices: Optional[int] = None
    # ZeRO/FSDP-style parameter + optimizer-state sharding over the same
    # 'data' mesh axis (requires dp_devices > 1): each leaf's largest
    # divisible axis is sharded, GSPMD all-gathers on use. Cuts per-chip
    # params+opt memory ~1/N at the cost of all-gather traffic — the lever
    # when the model outgrows one chip's HBM.
    fsdp: bool = False
    # Optimizer algorithm: "adamw" (reference contract, torch-exact) or
    # "schedule-free" (train/schedule_free.py — the reference vendors Meta's
    # AdamWScheduleFree but never instantiates it, quirk Q9; here it is a
    # working option: validation/checkpoints/embeddings automatically use the
    # averaged x iterate, and the Lightning ckpt omits optimizer_states since
    # the schedule-free state has no torch-AdamW layout).
    optimizer: str = "adamw"
    # AOT program cache directory for device-fit stage programs: COMPILED
    # executables are serialized (jax.experimental.serialize_executable) and
    # reloaded in ~0.2 s by later processes — skipping trace, lowering and
    # backend compile (dp runs included; keys carry a source-code hash so
    # stale programs never replay). The CLI defaults this ON
    # (~/.cache/hippie_tpu_aot); see train/device_fit._aot_call.
    aot_dir: Optional[str] = None
    # Stage-fit execution: "device" (default) runs the whole fit — epochs,
    # validation, early stopping, best-ckpt snapshot — as ONE jitted
    # lax.while_loop (train/device_fit.py; zero per-epoch host round trips,
    # per-epoch logs replayed after the stage); "host" is the per-epoch
    # Python loop (train/loop.py; live per-epoch prints, bit-compatible
    # trajectory). --resume works with BOTH loops (shared orbax format).
    fit_loop: str = "device"
    # Live progress for device fits: run the (one) compiled fit program in
    # epoch chunks of this size with prints/logs between chunks (identical
    # trajectory; one extra dispatch + tiny fetch per chunk). None = auto
    # (patience-sized chunks on multi-epoch stages when anyone is watching);
    # 0 = single dispatch, logs replayed post-stage.
    progress_every: Optional[int] = None
    # Opt-in per-train-batch metric records ({train_loss_step, ...} per
    # executed batch via log_fn) — the reference's per-step self.log
    # granularity (model.py:111-113). Device fit loop only.
    log_every_step: bool = False
    # Seed stage 1 from an existing Lightning checkpoint instead of fitting
    # it — the sweep->pipeline loop: `hippie-tpu lr-sweep --export-winner`
    # writes a stage-1 ckpt whose winning replica these paths feed straight
    # into stages 2-3 (the reference's reload-best-then-continue contract,
    # train_model.py:160-163, with the reload coming from a sweep instead of
    # the stage-1 fit). Geometry must match this pipeline's stage-1 config.
    # stage1_{wave,time}_ckpt: unimodal pipeline; stage1_joint_ckpt: the
    # multimodal pipeline's equivalent (lr-sweep --modality joint winner).
    stage1_wave_ckpt: Optional[str] = None
    stage1_time_ckpt: Optional[str] = None
    stage1_joint_ckpt: Optional[str] = None


# Jitted model inits: a single compiled call instead of hundreds of eager ops
# (each eager op pays a full host->device round trip on remote backends).
# jit returns key-SORTED dicts; the torch-registration insertion order (the
# state_dict/optimizer-index contract) is restored from an eval_shape template
# built by the plain python init (no device work).
_init_unimodal_jit = jax.jit(cvae.unimodal_cvae_init, static_argnums=1)
_init_multimodal_jit = jax.jit(cvae.multimodal_cvae_init, static_argnums=1)


def _init_unimodal(key, cfg_m):
    p, s = _init_unimodal_jit(key, cfg_m)
    tp, ts = jax.eval_shape(lambda k: cvae.unimodal_cvae_init(k, cfg_m), key)
    return ckpt_mod.reorder_like(tp, p), ckpt_mod.reorder_like(ts, s)


def _init_multimodal(key, cfg_m):
    p, s = _init_multimodal_jit(key, cfg_m)
    tp, ts = jax.eval_shape(lambda k: cvae.multimodal_cvae_init(k, cfg_m), key)
    return ckpt_mod.reorder_like(tp, p), ckpt_mod.reorder_like(ts, s)


def _ordering_template(cfg_m, multimodal: bool = False):
    """Torch-insertion-ordered ShapeDtypeStruct trees — for consumers that
    only need key ORDER (BestTracker.reorder_like), not values: costs zero
    device work / compile-service round trips, unlike a real init. Stage-3
    seeds still use real inits (their fresh class-embedding values are kept
    by the Q10 graft)."""
    init = cvae.multimodal_cvae_init if multimodal else cvae.unimodal_cvae_init
    return jax.eval_shape(lambda k: init(k, cfg_m), jax.random.PRNGKey(0))


# ---------------------------------------------------------------------------
# Data assembly
# ---------------------------------------------------------------------------


def load_dataset(cfg: PipelineConfig, name: str, *, dropna: bool = False) -> ArrayDataset:
    """Load + preprocess one dataset to device-resident arrays."""
    wf, isi = registry.load_raw(
        cfg.data_root, name, dropna=dropna, drop_index_column=cfg.drop_index_column
    )
    wave, isi_p = preprocess.preprocess_pair(jnp.asarray(wf), jnp.asarray(isi))
    src = jnp.full((wf.shape[0],), registry.DATASET_SOURCE_IDS.get(name, 0), jnp.int32)
    return ArrayDataset(wave=wave, isi=isi_p, source=src)


def load_pretrain_pool(cfg: PipelineConfig) -> ArrayDataset:
    """Leave-target-out pool (train_model.py:64-100)."""
    names = registry.pretrain_pool(cfg.dataset, strict_leakage_guard=cfg.strict_leakage_guard)
    parts = []
    for name in names:
        try:
            part = load_dataset(cfg, name)
        except FileNotFoundError:
            if cfg.verbose:
                print(f"Folder {name} missing data files; skipping")
            continue
        if cfg.verbose:
            print(f"Folder {name} has shapes {tuple(part.wave.shape)} and {tuple(part.isi.shape)}")
        parts.append(part)
    if not parts:
        raise RuntimeError("no pretraining datasets available")
    ds = ArrayDataset.concat(parts)
    if cfg.verbose:
        print(f"Total waveforms {len(ds)} and total isi {len(ds)}")
    return ds


# ---------------------------------------------------------------------------
# Stage runner helpers
# ---------------------------------------------------------------------------


def _fork_state(params, bn, tx) -> step.TrainState:
    """Fresh TrainState with device COPIES of params/bn.

    Stage epochs donate their input buffers; seeding a stage with aliases of a
    tracker's best trees would invalidate the tracker (and anything else
    holding those arrays) on the first donated step.
    """
    params, bn = loop.device_clone((params, bn))
    return step.TrainState(params, bn, jax.jit(tx.init)(params))


@jax.jit
def _sf_resume_jit(x_params, bn, opt_state):
    """One compiled dispatch for the schedule-free stage-resume math: recover
    the y training iterate from the checkpointed x iterate (the reference's
    .train() mode switch, optimizers.py:94-104) and deep-copy everything so
    the donated fit buffers never alias a tracker's snapshots."""
    from hippie_tpu.train import schedule_free as sfree

    sf = optim.find_schedule_free_state(opt_state)
    y = sfree.train_params(sf, x_params)
    return jax.tree_util.tree_map(jnp.copy, (y, bn, opt_state))


def _sf_fork_state(x_params, bn, tx, prev_opt_state, drop=()) -> step.TrainState:
    """Stage warm start that CONTINUES schedule-free averaging.

    A fresh ``tx.init`` would restart the run-weighted average (k=0, fresh z)
    at every stage boundary; instead the previous stage's (k, weight_sum,
    lr_max, z, exp_avg_sq) are carried into the fresh chain state — with
    template-fresh leaves for ``drop`` subtrees (the stage-3 class-embedding
    surgery, quirk Q10) — and training resumes at y = train_params(sf, x).
    ``x_params`` must be the x (eval) iterate, which is what _finalize_fit
    hands every consumer of a schedule-free fit.
    """
    fresh_opt = jax.jit(tx.init)(x_params)
    prev_sf = optim.find_schedule_free_state(prev_opt_state)
    if prev_sf is None:  # AdamW (or unfitted) predecessor: plain fork
        return _fork_state(x_params, bn, tx)
    fresh_sf = optim.find_schedule_free_state(fresh_opt)
    new_sf = fresh_sf._replace(
        k=prev_sf.k, weight_sum=prev_sf.weight_sum, lr_max=prev_sf.lr_max,
        z=_graft(fresh_sf.z, prev_sf.z, drop),
        exp_avg_sq=_graft(fresh_sf.exp_avg_sq, prev_sf.exp_avg_sq, drop),
    )
    new_opt = optim.replace_schedule_free_state(fresh_opt, new_sf)
    y, bn2, opt2 = _sf_resume_jit(x_params, bn, new_opt)
    return step.TrainState(y, bn2, opt2)


def _stage_fork(cfg: PipelineConfig, params, bn, tx, prev_opt, drop=()) -> step.TrainState:
    """Warm-start TrainState for the next stage: schedule-free continues the
    averaging from ``prev_opt`` (tracker/result optimizer state); AdamW gets
    the reference's fresh per-fit optimizer (configure_optimizers per
    Trainer.fit)."""
    if cfg.optimizer == "schedule-free" and prev_opt is not None:
        return _sf_fork_state(params, bn, tx, prev_opt, drop)
    return _fork_state(params, bn, tx)


class BestTracker:
    """ModelCheckpoint(save_top_k=1, mode='min') semantics, shareable across
    stages like the reference's reused callback object.

    Writes are DEFERRED: update_from_fit only snapshots device refs (the fit
    loop device-cloned them, so they survive donation); ``flush()`` performs
    the expensive host fetch + torch-layout conversion + disk write once,
    at pipeline end (or overlapped with later stages via ``flush_async``).
    This removes ~30-55 s of per-run host transfers vs eager per-stage
    writes. Crash resume is orbax's job (--resume), not the Lightning
    ckpt's; stage handoffs read the device-resident best trees directly
    (``_seed_from_best``), never the file.
    """

    def __init__(self, path: str):
        self.path = path
        self.best_val = math.inf
        self.best_params = None
        self.best_bn = None
        self.best_opt = None  # survives flush: stage handoffs continue from it
        self._pending = None  # (opt_state, template, lr, wd) awaiting flush
        self._thread = None
        self._thread_err = None

    def update_from_fit(self, result: loop.FitResult, params_template, opt_meta):
        if result.best_epoch >= 0 and result.best_val_loss < self.best_val:
            self.best_val = result.best_val_loss
            self.best_params = result.best_params
            self.best_bn = result.best_bn_state
            self.best_opt = result.best_opt_state
            lr, wd = opt_meta
            self._pending = (result.best_opt_state, params_template, lr, wd)
            return True
        return False

    def _write(self):
        opt_state, params_template, lr, wd = self._pending
        try:
            best_opt_torch = optim.adamw_state_to_torch(
                opt_state, self.best_params, self.best_bn, lr=lr, weight_decay=wd
            )
        except ValueError:
            # schedule-free state has no torch-AdamW layout; the ckpt carries
            # model weights (x iterate) only — empty optimizer_states — and
            # the averaging state goes to a sidecar file next to the ckpt.
            best_opt_torch = None
        ordered_p = ckpt_mod.reorder_like(params_template[0], self.best_params)
        ordered_s = ckpt_mod.reorder_like(params_template[1], self.best_bn)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        if best_opt_torch is None and opt_state is not None:
            optim.save_schedule_free_sidecar(self.path, opt_state)
        ckpt_mod.save_lightning_ckpt(
            self.path, ordered_p, ordered_s, optimizer_state=best_opt_torch
        )
        self._pending = None

    def flush(self):
        """Write the best checkpoint to disk if a new best is pending
        (joining any in-flight background write first)."""
        self.wait()
        if self._pending is not None:
            self._write()

    def flush_async(self):
        """Start the host fetch + torch conversion + disk write in a
        background thread so it overlaps later pipeline stages (the tracked
        trees are device-cloned snapshots no fit will donate; jax dispatch is
        thread-safe). Join with ``wait()``/``flush()``."""
        import threading

        self.wait()
        if self._pending is None:
            return

        def run():
            try:
                self._write()
            except BaseException as e:  # re-raised on wait()
                self._thread_err = e

        # Non-daemon: if the pipeline dies mid-stage, interpreter shutdown
        # waits for the in-flight ckpt write instead of killing it half-done
        # (the write itself is also atomic — checkpoint.save_lightning_ckpt).
        self._thread = threading.Thread(target=run, daemon=False)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._thread_err is not None:
            err, self._thread_err = self._thread_err, None
            raise err


def _graft(template, source, drop=()):
    """Template tree with ``source``'s leaves grafted in, except subtrees
    named in ``drop`` (top-level keys), which keep the template's fresh
    values. Walks the template, so the result has the template's insertion
    order (the torch registration order)."""
    out = {}
    for k, v in template.items():
        if k in drop or not (isinstance(source, dict) and k in source):
            out[k] = v
        elif isinstance(v, dict):
            out[k] = _graft(v, source[k])
        else:
            out[k] = source[k]
    return out


def _seed_from_best(best_params, best_bn, template, drop=("class_embedding",)):
    """Seed the next stage's (params, bn) from a tracker's device-resident
    best trees directly — bit-identical to the reference's checkpoint detour
    (save .ckpt -> torch load -> load_state_dict(strict=False) minus
    class_embedding, train_model.py:333-347 / quirk Q10) without the
    ~100-160 MB device->host->device round trip (tests/test_pipeline.py
    asserts the equivalence). Returns device COPIES: the sources stay valid
    for the tracker's deferred ckpt write even after stage epochs donate the
    returned buffers."""
    tp, tbn = template
    params = _graft(tp, best_params, drop)
    bn = _graft(tbn, best_bn)
    params, bn = loop.device_clone((params, bn))
    # the jitted clone returns key-sorted dicts; restore registration order
    return ckpt_mod.reorder_like(tp, params), ckpt_mod.reorder_like(tbn, bn)


def _aot_cfg_desc(cfg: PipelineConfig) -> str:
    """Config facts that change the traced fit program but not its arg
    shapes — part of the AOT cache key."""
    return (f"wd={cfg.weight_decay}|lb={cfg.loss_backend}|bb={cfg.block_backend}|"
            f"opt={cfg.optimizer}|osd={cfg.opt_state_dtype}")


def _progress_chunk(cfg: PipelineConfig, max_epochs: int) -> Optional[int]:
    """Epoch chunk size for live device-fit progress (see PipelineConfig
    .progress_every). Auto mode only chunks multi-epoch stages someone is
    actually watching (verbose prints or a log_fn)."""
    if cfg.progress_every is not None:
        return cfg.progress_every if cfg.progress_every > 0 else None
    if not cfg.verbose and cfg.log_fn is None:
        return None
    if max_epochs <= 10:
        return None
    patience = cfg.early_stopping_patience or 10
    return max(10, min(patience, 50))


def _eval_params_fn(cfg: PipelineConfig):
    """device_fit hook: schedule-free evaluates at the averaged x iterate."""
    if cfg.optimizer != "schedule-free":
        return None
    return lambda ts: optim.maybe_eval_params(ts.opt_state, ts.params)


def _finalize_fit(cfg: PipelineConfig, result: loop.FitResult) -> loop.FitResult:
    """Post-fit param convention: with schedule-free, everything downstream of
    a fit (checkpoints, embeddings, stage handoffs) consumes the averaged x
    iterate — the reference's .eval() mode switch (optimizers.py:82-92) —
    so convert best/final params once here. Identity for AdamW."""
    if cfg.optimizer != "schedule-free":
        return result
    import dataclasses

    best_p = (optim.eval_params_jit(result.best_opt_state, result.best_params)
              if result.best_opt_state is not None else result.best_params)
    final_p = optim.eval_params_jit(result.state.opt_state, result.state.params)
    return dataclasses.replace(
        result,
        best_params=best_p,
        state=step.TrainState(final_p, result.state.bn_state, result.state.opt_state),
    )


def _fit_stage(
    *,
    cfg: PipelineConfig,
    ts: step.TrainState,
    arrays: Tuple[jnp.ndarray, ...],
    source: jnp.ndarray,
    class_: jnp.ndarray,
    train_indices: np.ndarray,
    val_indices: np.ndarray,
    batch_size: int,
    max_epochs: int,
    use_class_labels: bool,
    shuffle_train: bool,
    make_steps,
    make_epoch_fns,
    aot_desc: str,
    fixed_train_stream: Optional[np.ndarray] = None,
    stage_seed: int = 0,
    resume_dir: Optional[str] = None,
    lr: Optional[float] = None,
) -> loop.FitResult:
    """One Trainer.fit equivalent, shared by both model families.

    ``arrays`` is the tuple of per-sample gather sources ((data,) unimodal,
    (wave, isi) multimodal); the family enters only via ``make_steps`` /
    ``make_epoch_fns`` closures. Everything else — bucketing, dp placement,
    the val plan, and device/host loop selection — must stay IDENTICAL
    between families (the device/host trajectory-parity contract).

    Shape-buckets the gather sources and batch plans (power-of-two rows /
    plan lengths) and runs the bucketed epoch mode: with the learning rate
    injected as optimizer state, stages and datasets that land in the same
    buckets share ONE compiled program via the persistent compile cache —
    the main lever on cold-compile wall-clock.
    """
    n_bucket = device_data.next_pow2(int(arrays[0].shape[0]))
    arrays = tuple(device_data.pad_rows(a, n_bucket) for a in arrays)
    source = device_data.pad_rows(source, n_bucket)
    class_ = device_data.pad_rows(class_, n_bucket)

    mesh, repl, plan_sharding = _dp_shardings(cfg)
    if repl is not None:
        # data parallelism: dataset replicated, plans batch-sharded; GSPMD
        # inserts the gradient all-reduce over the 'data' mesh axis. The
        # TrainState is replicated (dp) or per-leaf sharded (--fsdp).
        arrays = tuple(jax.device_put(a, repl) for a in arrays)
        source, class_ = (jax.device_put(a, repl) for a in (source, class_))
        ts = _place_train_state(cfg, mesh, repl, ts)

    def _plan_arrays(idx, mask):
        idx, mask = jnp.asarray(idx), jnp.asarray(mask)
        if plan_sharding is not None:
            idx = jax.device_put(idx, plan_sharding)
            mask = jax.device_put(mask, plan_sharding)
        return idx, mask

    val_plan = loop.limit_batches(
        batch_plan(val_indices, batch_size, shuffle=False), cfg.limit_val_batches
    )
    v_idx, v_mask, v_nb = device_data.pad_plan(
        val_plan[0], val_plan[1], device_data.next_pow2(val_plan[0].shape[0], minimum=1)
    )
    val_idx, val_mask = _plan_arrays(v_idx, v_mask)
    val_nb = jnp.asarray(v_nb, jnp.int32)

    stream = fixed_train_stream if fixed_train_stream is not None else train_indices

    if cfg.fit_loop == "device":
        # Whole fit as one XLA call (train/device_fit.py): no per-epoch RTTs.
        # --resume runs the same program in chunks with orbax saves between
        # them (same on-disk format as the host loop).
        from hippie_tpu.train import device_fit as dfit

        batch_step, eval_step = make_steps()
        return _finalize_fit(cfg, dfit.device_fit(
            ts,
            batch_step=batch_step, eval_step=eval_step,
            arrays=arrays, source=source, class_=class_,
            train_stream=np.asarray(stream), batch_size=batch_size,
            val_idx=val_idx, val_mask=val_mask, val_nb=val_nb,
            max_epochs=max_epochs,
            early_stopping_patience=cfg.early_stopping_patience,
            seed=cfg.seed + stage_seed,
            use_class_labels=use_class_labels, shuffle=shuffle_train,
            limit_train_batches=cfg.limit_train_batches,
            plan_sharding=plan_sharding,
            eval_params_fn=_eval_params_fn(cfg),
            aot_dir=cfg.aot_dir,
            aot_desc=aot_desc,
            log_fn=cfg.log_fn, verbose=cfg.verbose, lr=lr,
            progress_every=_progress_chunk(cfg, max_epochs),
            log_steps=cfg.log_every_step,
            resume_dir=resume_dir,
        ))

    # Host-loop path only (--fit-loop host): per-epoch jitted
    # runners driven from Python.
    train_epoch, eval_epoch = make_epoch_fns()

    def run_train(state, key, epoch):
        # Same canonical bucketed plan as device_fit generates in-device, so
        # --fit-loop host stays on the identical trajectory.
        idx, mask, nb = device_data.host_epoch_plan(
            stream, batch_size, shuffle_train, jax.random.fold_in(key, 0),
            cfg.limit_train_batches,
        )
        idx, mask = _plan_arrays(idx, mask)
        return train_epoch(
            state, *arrays, source, class_, idx, mask,
            jax.random.fold_in(key, 1), jnp.asarray(nb, jnp.int32),
        )

    def run_val(state, key, epoch):
        vp = (optim.eval_params_jit(state.opt_state, state.params)
              if cfg.optimizer == "schedule-free" else state.params)
        return eval_epoch(
            vp, state.bn_state, *arrays, source, class_, val_idx, val_mask,
            key, val_nb,
        )

    return _finalize_fit(cfg, loop.fit(
        ts,
        run_train_epoch=run_train,
        run_val_epoch=run_val,
        max_epochs=max_epochs,
        early_stopping_patience=cfg.early_stopping_patience,
        seed=cfg.seed + stage_seed,
        verbose=cfg.verbose,
        log_fn=cfg.log_fn,
        resume_dir=resume_dir,
        lr=lr,
    ))


def _fit_unimodal_stage(
    *,
    cfg: PipelineConfig,
    ts: step.TrainState,
    tx,
    data: jnp.ndarray,
    source: jnp.ndarray,
    class_: jnp.ndarray,
    train_indices: np.ndarray,
    val_indices: np.ndarray,
    batch_size: int,
    max_epochs: int,
    beta: float,
    use_class_labels: bool,
    shuffle_train: bool,
    fixed_train_stream: Optional[np.ndarray] = None,
    stage_seed: int = 0,
    resume_dir: Optional[str] = None,
    lr: Optional[float] = None,
    aot_extra: str = "",
) -> loop.FitResult:
    """One Trainer.fit equivalent for a unimodal model."""
    return _fit_stage(
        cfg=cfg, ts=ts, arrays=(data,), source=source, class_=class_,
        train_indices=train_indices, val_indices=val_indices,
        batch_size=batch_size, max_epochs=max_epochs,
        use_class_labels=use_class_labels, shuffle_train=shuffle_train,
        make_steps=lambda: step.make_unimodal_steps(
            tx, beta=beta, loss_backend=cfg.loss_backend,
            block_backend=cfg.block_backend,
        ),
        make_epoch_fns=lambda: step.make_unimodal_epoch_fns(
            tx, beta=beta, use_class_labels=use_class_labels,
            loss_backend=cfg.loss_backend, block_backend=cfg.block_backend,
        ),
        aot_desc=f"uni|beta={beta}|{_aot_cfg_desc(cfg)}|{aot_extra}",
        fixed_train_stream=fixed_train_stream, stage_seed=stage_seed,
        resume_dir=resume_dir, lr=lr,
    )


def _fit_multimodal_stage(
    *,
    cfg: PipelineConfig,
    ts: step.TrainState,
    tx,
    wave: jnp.ndarray,
    isi: jnp.ndarray,
    source: jnp.ndarray,
    class_: jnp.ndarray,
    train_indices: np.ndarray,
    val_indices: np.ndarray,
    batch_size: int,
    max_epochs: int,
    use_class_labels: bool,
    shuffle_train: bool,
    fixed_train_stream: Optional[np.ndarray] = None,
    stage_seed: int = 0,
    resume_dir: Optional[str] = None,
    lr: Optional[float] = None,
    aot_extra: str = "",
) -> loop.FitResult:
    """One Trainer.fit equivalent for the joint model (shared _fit_stage)."""
    return _fit_stage(
        cfg=cfg, ts=ts, arrays=(wave, isi), source=source, class_=class_,
        train_indices=train_indices, val_indices=val_indices,
        batch_size=batch_size, max_epochs=max_epochs,
        use_class_labels=use_class_labels, shuffle_train=shuffle_train,
        make_steps=lambda: step.make_multimodal_steps(
            tx, beta=cfg.beta, mod1_weight=cfg.mod1_weight,
            mod2_weight=cfg.mod2_weight,
            loss_backend=cfg.loss_backend, block_backend=cfg.block_backend,
        ),
        make_epoch_fns=lambda: step.make_multimodal_epoch_fns(
            tx, beta=cfg.beta, mod1_weight=cfg.mod1_weight,
            mod2_weight=cfg.mod2_weight, use_class_labels=use_class_labels,
            loss_backend=cfg.loss_backend, block_backend=cfg.block_backend,
        ),
        aot_desc=(f"mm|beta={cfg.beta}|w={cfg.mod1_weight},{cfg.mod2_weight}|"
                  f"{_aot_cfg_desc(cfg)}|{aot_extra}"),
        fixed_train_stream=fixed_train_stream, stage_seed=stage_seed,
        resume_dir=resume_dir, lr=lr,
    )


def _finetune_split_indices(cfg: PipelineConfig, n: int, key) -> Tuple[np.ndarray, np.ndarray]:
    """10%/90% fine-tune split, or the chip earliest-timestamps rule
    (train_model.py:179-190)."""
    meta = registry.load_metadata(cfg.data_root, cfg.dataset)
    if meta is not None and "chip" in cfg.dataset:
        return registry.chip_finetune_split(meta)
    return train_val_split(n, cfg.finetune_split, key)



def _eval_mesh(cfg: PipelineConfig):
    """Mesh for data-parallel eval/embedding extraction (None when single-device).

    Under --dp-devices the trained trees already live on the mesh; sharding
    the extraction inputs too makes eval scale with the fit instead of
    funnelling every forward through one device."""
    return _dp_shardings(cfg)[0]


def _dp_shardings(cfg: PipelineConfig):
    """(mesh, replicated, plan) for cfg.dp_devices, or (None, None, None)."""
    if not cfg.dp_devices or cfg.dp_devices <= 1:
        if cfg.fsdp:
            raise ValueError("--fsdp requires --dp-devices > 1 (a device mesh)")
        return None, None, None
    from hippie_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(cfg.dp_devices)
    return mesh, pmesh.replicated(mesh), pmesh.batch_sharded(mesh, batch_axis=1, ndim=2)


def _place_train_state(cfg: PipelineConfig, mesh, repl, ts: step.TrainState) -> step.TrainState:
    """Mesh placement for a stage's TrainState: replicated for plain data
    parallelism, or ZeRO-style per-leaf sharding of params + optimizer state
    over the 'data' axis with --fsdp (parallel/mesh.py:49-73; BN trees are
    tiny and stay replicated). GSPMD all-gathers shards on use and keeps the
    optimizer update sharded."""
    if not cfg.fsdp:
        return jax.device_put(ts, repl)
    from hippie_tpu.parallel import mesh as pmesh

    return step.TrainState(
        pmesh.shard_params_fsdp(mesh, ts.params),
        jax.device_put(ts.bn_state, repl),
        pmesh.shard_params_fsdp(mesh, ts.opt_state),
    )


def _stage_resume_dir(cfg: PipelineConfig, stage: str) -> Optional[str]:
    if not cfg.resume:
        return None
    # Keyed by dataset: stage fit states have identical pytree shapes across
    # targets, so a dataset-agnostic path would silently resume target B from
    # target A's saved state (e.g. in scripts/sweep_targets.py --resume).
    legacy = os.path.join(cfg.checkpoint_dir, "resume", stage)
    if os.path.isdir(legacy) and cfg.verbose:
        print(
            f"NOTE: ignoring pre-round-2 resume state at {legacy} "
            f"(resume dirs are now keyed by dataset); delete it or move it to "
            f"{os.path.join(cfg.checkpoint_dir, 'resume', cfg.dataset, stage)}"
        )
    return os.path.join(cfg.checkpoint_dir, "resume", cfg.dataset, stage)


# ---------------------------------------------------------------------------
# CSV export helpers (reference file contracts)
# ---------------------------------------------------------------------------


def export_pretraining_embeddings(cfg: PipelineConfig, tagged: Dict[str, np.ndarray]):
    """pretraining_<ds>_<kind>_embeddings.csv with the reference's single
    'embeddings' object column (train_model.py:249-264)."""
    paths = {}
    for kind, arr in tagged.items():
        df = pd.DataFrame({"embeddings": [np.asarray(r) for r in arr]})
        path = os.path.join(cfg.output_dir, f"pretraining_{cfg.dataset}_{kind}_embeddings.csv")
        df.to_csv(path)
        paths[kind] = path
    return paths


def export_knn_csv(cfg: PipelineConfig, kind: str, pred, true, le) -> str:
    df = pd.DataFrame({"pred": le.inverse_transform(pred), "true": le.inverse_transform(true)})
    path = os.path.join(cfg.output_dir, f"{cfg.dataset}_{kind}_knn.csv")
    df.to_csv(path)
    return path


def export_embeddings_csv(cfg: PipelineConfig, kind: str, embeddings, labels, le) -> str:
    df = pd.DataFrame(np.asarray(embeddings))
    df["label"] = le.inverse_transform(labels)
    path = os.path.join(cfg.output_dir, f"{cfg.dataset}_{kind}_embeddings.csv")
    df.to_csv(path)
    return path


# ---------------------------------------------------------------------------
# Unimodal pipeline (scripts/train_model.py)
# ---------------------------------------------------------------------------


def run_unimodal_pipeline(cfg: PipelineConfig) -> Dict[str, Any]:
    with trace(cfg.profile_dir):
        return _run_unimodal_pipeline(cfg)


def _run_unimodal_pipeline(cfg: PipelineConfig) -> Dict[str, Any]:
    timer = StageTimer()
    # Eval programs (embed forward, KNN sweep) route through the same AOT
    # executable cache as the stage-fit programs, so fresh processes skip
    # their trace+lower+compile too (hippie_tpu/utils/aot.py).
    aot.set_default_dir(cfg.aot_dir)
    if cfg.discover_datasets:
        new = registry.discover_datasets(cfg.data_root)
        if new and cfg.verbose:
            print(f"discovered datasets: {', '.join(new)}")
    os.makedirs(cfg.output_dir, exist_ok=True)
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    root = jax.random.PRNGKey(cfg.seed)

    # ---------------- Stage 1: leave-target-out pretraining ----------------
    pool = None
    if not (cfg.stage1_wave_ckpt and cfg.stage1_time_ckpt):
        # Both-ckpts runs never touch the pool: skip the (multi-dataset)
        # ingest+preprocess entirely.
        with timer.stage("load_pool"):
            pool = load_pretrain_pool(cfg)
        tr_idx, va_idx = train_val_split(len(pool), cfg.train_val_split, jax.random.fold_in(root, 0))

    num_sources = registry.NUM_SOURCES
    trackers: Dict[str, BestTracker] = {}
    states: Dict[str, step.TrainState] = {}
    templates: Dict[str, Tuple] = {}
    prev_opts: Dict[str, Any] = {}  # schedule-free continuation (per modality)

    for mi, modality in enumerate(("wave", "time")):
        out_size = 50 if modality == "wave" else 100
        # Quirk Q7: the wave pretrain/finetune trainer has no grad clipping.
        clip = None if modality == "wave" else cfg.gradient_clip_val
        cfg_m = cvae.CVAEConfig(
            z_dim=cfg.z_dim, output_size=out_size, class_hidden_dim=cfg.class_hidden_dim,
            num_sources=num_sources, num_classes=5, num_blocks=tuple(cfg.num_blocks),
        )
        tracker = BestTracker(os.path.join(cfg.checkpoint_dir, f"{cfg.dataset}_{modality}_model.ckpt"))
        stage1_ckpt = cfg.stage1_wave_ckpt if modality == "wave" else cfg.stage1_time_ckpt
        if stage1_ckpt:
            # Sweep->pipeline seam: skip the stage-1 fit, seed stages 2-3
            # from the checkpoint's weights (lr-sweep --export-winner, or any
            # Lightning stage-1 ckpt — ours or reference-trained).
            from hippie_tpu import export as export_mod

            with timer.stage(f"load_stage1_{modality}"):
                lp, lbn, lcfg = export_mod.load_model_from_ckpt(
                    stage1_ckpt, multimodal=False, fallback_config=cfg_m)
            if tuple(lcfg) != tuple(cfg_m):
                raise ValueError(
                    f"--stage1-{'wave' if modality == 'wave' else 'time'}-ckpt geometry "
                    f"{lcfg} does not match this pipeline's stage-1 config {cfg_m}; "
                    "re-run the sweep with matching --z-dim/--num-blocks")
            templates[modality] = _ordering_template(cfg_m)
            states[modality] = step.TrainState(lp, lbn, None)
            # The loaded weights seed the tracker's best trees (stage-3's Q10
            # graft reads them); best_val stays inf so the first stage-2
            # improvement takes over the on-disk ckpt.
            tracker.best_params, tracker.best_bn = lp, lbn
            prev_opts[modality] = None
            trackers[modality] = tracker
            if cfg.verbose:
                print(f"[stage 1] {modality} model seeded from {stage1_ckpt} (fit skipped)")
            continue
        data = pool.wave if modality == "wave" else pool.isi
        with timer.stage("setup"):
            params, bn = _init_unimodal(jax.random.fold_in(root, 100 + mi), cfg_m)
            templates[modality] = _ordering_template(cfg_m)
            tx = optim.make_optimizer(cfg.learning_rate, cfg.weight_decay, clip, state_dtype=cfg.opt_state_dtype, algorithm=cfg.optimizer)
            ts = step.TrainState(params, bn, jax.jit(tx.init)(params))
        if cfg.verbose:
            print(f"[stage 1] pretraining {modality} model ({cvae.param_count(params):,} params)")
        with timer.stage(f"pretrain_{modality}"):
            result = _fit_unimodal_stage(
                cfg=cfg, ts=ts, tx=tx, data=data, source=pool.source, class_=pool.source,
                train_indices=tr_idx, val_indices=va_idx, batch_size=cfg.batch_size,
                max_epochs=cfg.pretrain_max_epochs, beta=1.0,  # quirk Q6
                use_class_labels=False, shuffle_train=True, stage_seed=10 + mi,
                resume_dir=_stage_resume_dir(cfg, f"pretrain_{modality}"),
                lr=cfg.learning_rate, aot_extra=f"clip={clip}",
            )
        with timer.stage("ckpt_save"):
            tracker.update_from_fit(result, templates[modality], (cfg.learning_rate, cfg.weight_decay))
        # Reference reloads the best ckpt after stage 1 (train_model.py:160-163).
        # (Fallback to the last state for the max_epochs=0 edge, where no
        # validation ever ran and the tracker is empty.)
        best_p = tracker.best_params if tracker.best_params is not None else result.state.params
        best_bn = tracker.best_bn if tracker.best_bn is not None else result.state.bn_state
        states[modality] = step.TrainState(best_p, best_bn, None)
        prev_opts[modality] = (
            tracker.best_opt if tracker.best_params is not None else result.best_opt_state
        )
        trackers[modality] = tracker

    # ---------------- Stage 2: unsupervised fine-tune on the target --------
    with timer.stage("load_target"):
        target = load_dataset(cfg, cfg.dataset, dropna=True)  # quirk Q13
    target_source_id = registry.DATASET_SOURCE_IDS.get(cfg.dataset, 0)
    target = ArrayDataset(
        wave=target.wave, isi=target.isi,
        source=jnp.full((len(target),), target_source_id, jnp.int32),
    )

    ft_lr = cfg.learning_rate / 10.0
    if cfg.finetune_without_labels:
        ft_tr, ft_va = _finetune_split_indices(cfg, len(target), jax.random.fold_in(root, 1))
        for mi, modality in enumerate(("wave", "time")):
            data = target.wave if modality == "wave" else target.isi
            clip = None if modality == "wave" else cfg.gradient_clip_val
            tx = optim.make_optimizer(ft_lr, cfg.weight_decay, clip, state_dtype=cfg.opt_state_dtype, algorithm=cfg.optimizer)
            st = states[modality]
            ts = _stage_fork(cfg, st.params, st.bn_state, tx, prev_opts.get(modality))
            if cfg.verbose:
                print(f"[stage 2] fine-tuning {modality} model on {cfg.dataset} (lr={ft_lr})")
            with timer.stage(f"finetune_{modality}"):
                result = _fit_unimodal_stage(
                    cfg=cfg, ts=ts, tx=tx, data=data, source=target.source, class_=target.source,
                    train_indices=ft_tr, val_indices=ft_va, batch_size=cfg.batch_size,
                    max_epochs=cfg.finetune_max_epochs, beta=1.0, use_class_labels=False,
                    shuffle_train=False,  # reference uses shuffle=False here (train_model.py:198-199)
                    stage_seed=20 + mi,
                    resume_dir=_stage_resume_dir(cfg, f"finetune_{modality}"),
                    lr=ft_lr,
                    aot_extra=f"clip={clip}",
                )
            with timer.stage("ckpt_save"):
                trackers[modality].update_from_fit(result, templates[modality], (ft_lr, cfg.weight_decay))
            # Unimodal stage-2 embeddings use the LAST-epoch model (train_model.py:235).
            states[modality] = step.TrainState(result.state.params, result.state.bn_state, None)
        emb_idx = jnp.asarray(ft_tr)
    else:
        emb_idx = jnp.arange(len(target))

    wave_tree = (states["wave"].params, states["wave"].bn_state)
    time_tree = (states["time"].params, states["time"].bn_state)
    timer_embed = timer.stage("embeddings"); timer_embed.__enter__()
    ft_wave_emb, ft_isi_emb, ft_joint_emb = emb.get_embeddings(
        wave_tree, time_tree,
        target.wave[emb_idx], target.isi[emb_idx], target.source[emb_idx],
        mesh=_eval_mesh(cfg),
    )
    timer_embed.__exit__(None, None, None)
    pretrain_paths = export_pretraining_embeddings(
        cfg, {"waveform": ft_wave_emb, "isi": ft_isi_emb, "joint": ft_joint_emb}
    )

    # ---------------- Stage 3: supervised with class conditioning ----------
    with timer.stage("load_target"):
        sup_wf, sup_isi = registry.load_raw(
            cfg.data_root, cfg.dataset, drop_index_column=cfg.drop_index_column
        )  # no dropna (Q13)
        sup_wave, sup_isi_p = preprocess.preprocess_pair(jnp.asarray(sup_wf), jnp.asarray(sup_isi))
        sup_labels, le = registry.load_supervised_labels(cfg.data_root, cfg.dataset)

    n = len(sup_wf)
    s_tr, s_va = train_val_split(n, cfg.train_val_split, jax.random.fold_in(root, 2))
    label_train = sup_labels[s_tr]
    label_val = sup_labels[s_va]
    num_class_labels = int(len(np.unique(label_train)))

    labels_dev = jnp.asarray(sup_labels.astype(np.int32))
    source_dev = jnp.full((n,), target_source_id, jnp.int32)

    sup_states: Dict[str, step.TrainState] = {}
    sup_trackers: Dict[str, BestTracker] = {}
    # One balanced stream serves both modalities (fixed seed, same labels).
    stream = sampling.balanced_indices(label_train, seed=cfg.seed)
    train_stream = np.asarray(s_tr)[stream]
    for mi, modality in enumerate(("wave", "time")):
        out_size = 50 if modality == "wave" else 100
        data = sup_wave if modality == "wave" else sup_isi_p
        cfg_m = cvae.CVAEConfig(
            z_dim=cfg.z_dim, output_size=out_size, class_hidden_dim=cfg.class_hidden_dim,
            num_sources=num_sources, num_classes=num_class_labels,
            num_blocks=tuple(cfg.num_blocks),
        )
        with timer.stage("setup"):
            template = _init_unimodal(jax.random.fold_in(root, 200 + mi), cfg_m)
            # Seed from the cross-stage best trees minus the class embedding
            # (quirk Q10) — the device-resident equivalent of the reference's
            # reload-best-ckpt detour (train_model.py:333-347); the .ckpt
            # write itself happens off the critical path (flush_async below).
            tk = trackers[modality]
            src_p = tk.best_params if tk.best_params is not None else states[modality].params
            src_bn = tk.best_bn if tk.best_bn is not None else states[modality].bn_state
            params, bn = _seed_from_best(src_p, src_bn, template)
            tx = optim.make_optimizer(ft_lr, cfg.weight_decay, cfg.gradient_clip_val, state_dtype=cfg.opt_state_dtype, algorithm=cfg.optimizer)
            ts = (_sf_fork_state(params, bn, tx, tk.best_opt, drop=("class_embedding",))
                  if cfg.optimizer == "schedule-free" and tk.best_opt is not None
                  else step.TrainState(params, bn, jax.jit(tx.init)(params)))
        # Stage-1/2 trackers are final now: overlap their ckpt writes with the
        # supervised fits instead of serializing ~15-60 s of host I/O here.
        trackers[modality].flush_async()
        tracker = BestTracker(
            os.path.join(cfg.checkpoint_dir, f"{cfg.dataset}_{modality}_model_supervised.ckpt")
        )
        if cfg.verbose:
            print(f"[stage 3] supervised {modality} training ({num_class_labels} classes)")
        with timer.stage(f"supervised_{modality}"):
            result = _fit_unimodal_stage(
                cfg=cfg, ts=ts, tx=tx, data=data, source=source_dev, class_=labels_dev,
                train_indices=np.asarray(s_tr), val_indices=np.asarray(s_va),
                batch_size=cfg.supervised_batch_size, max_epochs=cfg.supervised_max_epochs,
                beta=1.0, use_class_labels=True, shuffle_train=False,
                fixed_train_stream=train_stream, stage_seed=30 + mi,
                resume_dir=_stage_resume_dir(cfg, f"supervised_{modality}"),
                lr=ft_lr,
                aot_extra=f"clip={cfg.gradient_clip_val}",
            )
        with timer.stage("ckpt_save"):
            tracker.update_from_fit(result, template, (ft_lr, cfg.weight_decay))
            tracker.flush_async()  # overlaps the eval / export phase below
        best_p = tracker.best_params if tracker.best_params is not None else result.state.params
        best_bn = tracker.best_bn if tracker.best_bn is not None else result.state.bn_state
        sup_states[modality] = step.TrainState(best_p, best_bn, None)
        sup_trackers[modality] = tracker

    # ---------------- Evaluation: embeddings + KNN sweep --------------------
    wave_tree = (sup_states["wave"].params, sup_states["wave"].bn_state)
    time_tree = (sup_states["time"].params, sup_states["time"].bn_state)

    tr_idx_dev = jnp.asarray(s_tr)
    va_idx_dev = jnp.asarray(s_va)
    # The reference extracts stage-3 embeddings WITH class conditioning
    # (2-D labels reach the forward, train_model.py:407-413) — a label leak
    # that trivializes the KNN evaluation. cfg.honest_eval opts out.
    emb_cls_tr = None if cfg.honest_eval else labels_dev[tr_idx_dev]
    emb_cls_va = None if cfg.honest_eval else labels_dev[va_idx_dev]
    timer_embed2 = timer.stage("embeddings"); timer_embed2.__enter__()
    wave_tr, isi_tr, joint_tr = emb.get_embeddings(
        wave_tree, time_tree, sup_wave[tr_idx_dev], sup_isi_p[tr_idx_dev],
        source_dev[tr_idx_dev], emb_cls_tr, mesh=_eval_mesh(cfg),
    )
    wave_va, isi_va, joint_va = emb.get_embeddings(
        wave_tree, time_tree, sup_wave[va_idx_dev], sup_isi_p[va_idx_dev],
        source_dev[va_idx_dev], emb_cls_va, mesh=_eval_mesh(cfg),
    )

    timer_embed2.__exit__(None, None, None)
    neighbor_options = list(range(5, 20))  # train_model.py:419
    accs: Dict[str, List[float]] = {}
    preds_by_kind: Dict[str, Dict[int, np.ndarray]] = {}
    with timer.stage("knn_eval"):
        for kind, e_tr, e_va in (
            ("joint", joint_tr, joint_va),
            ("waveform", wave_tr, wave_va),
            ("isi", isi_tr, isi_va),
        ):
            preds = knn_eval.knn_predict_sweep(
                e_tr, label_train, e_va, neighbor_options, mesh=_eval_mesh(cfg))
            preds_by_kind[kind] = preds
            accs[kind] = [metrics.balanced_accuracy_score(label_val, preds[k]) for k in neighbor_options]

    results: Dict[str, Any] = {
        "label_encoder": le,
        "neighbor_options": neighbor_options,
        "balanced_accuracy": accs,
        "best": {},
        "paths": {"pretraining_embeddings": pretrain_paths},
        "num_class_labels": num_class_labels,
        "checkpoints": {m: trackers[m].path for m in trackers},
        "supervised_checkpoints": {m: sup_trackers[m].path for m in sup_trackers},
    }

    for kind in ("waveform", "isi", "joint"):
        best_k = neighbor_options[int(np.argmax(accs[kind]))]
        pred = preds_by_kind[kind][best_k]
        cm = metrics.confusion_matrix(label_val, pred, labels=np.arange(len(le.classes_)))
        results["best"][kind] = {
            "k": best_k,
            "balanced_accuracy": float(np.max(accs[kind])),
            "confusion_matrix": cm,
            "pred": pred,
        }
        results["paths"][f"{kind}_knn"] = export_knn_csv(cfg, kind, pred, label_val, le)

    # Full-dataset embeddings export (train_model.py:480-507).
    with timer.stage("embeddings"):
        wave_all, isi_all, joint_all = emb.get_embeddings(
            wave_tree, time_tree, sup_wave, sup_isi_p, source_dev,
            None if cfg.honest_eval else labels_dev, mesh=_eval_mesh(cfg),
        )
    for kind, arr in (("waveform", wave_all), ("isi", isi_all), ("joint", joint_all)):
        results["paths"][f"{kind}_embeddings"] = export_embeddings_csv(cfg, kind, arr, sup_labels, le)

    with timer.stage("ckpt_save"):
        for t in list(trackers.values()) + list(sup_trackers.values()):
            t.flush()
    results["label_val"] = label_val
    results["label_train"] = label_train
    results["timings"] = dict(timer.timings)
    if cfg.verbose and timer.timings:
        print("stage timings:", timer.summary())
    return results


# ---------------------------------------------------------------------------
# Multimodal pipeline (train_model_with_multimodal.py:618-971)
# ---------------------------------------------------------------------------


def run_multimodal_pipeline(cfg: PipelineConfig) -> Dict[str, Any]:
    with trace(cfg.profile_dir):
        return _run_multimodal_pipeline(cfg)


def _run_multimodal_pipeline(cfg: PipelineConfig) -> Dict[str, Any]:
    timer = StageTimer()
    aot.set_default_dir(cfg.aot_dir)  # see _run_unimodal_pipeline
    if cfg.discover_datasets:
        new = registry.discover_datasets(cfg.data_root)
        if new and cfg.verbose:
            print(f"discovered datasets: {', '.join(new)}")
    os.makedirs(cfg.output_dir, exist_ok=True)
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    root = jax.random.PRNGKey(cfg.seed)
    num_sources = registry.NUM_SOURCES

    mm_cfg = cvae.MultiModalConfig(
        z_dim=cfg.z_dim, class_hidden_dim=cfg.class_hidden_dim,
        num_sources=num_sources, num_classes=5, num_blocks=tuple(cfg.num_blocks),
    )
    template = _ordering_template(mm_cfg, multimodal=True)
    tracker = BestTracker(os.path.join(cfg.checkpoint_dir, f"{cfg.dataset}_joint_model.ckpt"))

    if cfg.stage1_joint_ckpt:
        # Sweep->pipeline seam, joint flavor: skip the pool ingest AND the
        # stage-1 fit, seed stages 2-3 from the checkpoint's weights
        # (lr-sweep --modality joint --export-winner, or any joint Lightning
        # ckpt). Mirrors the unimodal stage1_{wave,time}_ckpt path.
        from hippie_tpu import export as export_mod

        with timer.stage("load_stage1_joint"):
            lp, lbn, lcfg = export_mod.load_model_from_ckpt(
                cfg.stage1_joint_ckpt, multimodal=True, fallback_config=mm_cfg)
        if tuple(lcfg) != tuple(mm_cfg):
            raise ValueError(
                f"--stage1-joint-ckpt geometry {lcfg} does not match this "
                f"pipeline's stage-1 config {mm_cfg}; re-run the sweep with "
                "matching --z-dim/--num-blocks")
        tracker.best_params, tracker.best_bn = lp, lbn
        state = step.TrainState(lp, lbn, None)
        prev_opt = None
        if cfg.verbose:
            print(f"[stage 1] joint model seeded from {cfg.stage1_joint_ckpt} "
                  "(fit skipped)")
    else:
        with timer.stage("load_pool"):
            pool = load_pretrain_pool(cfg)
        tr_idx, va_idx = train_val_split(len(pool), cfg.train_val_split, jax.random.fold_in(root, 0))
        params, bn = _init_multimodal(jax.random.fold_in(root, 100), mm_cfg)
        tx = optim.make_optimizer(cfg.learning_rate, cfg.weight_decay, cfg.gradient_clip_val, state_dtype=cfg.opt_state_dtype, algorithm=cfg.optimizer)
        ts = step.TrainState(params, bn, jax.jit(tx.init)(params))

        if cfg.verbose:
            print(f"[stage 1] pretraining joint model ({cvae.param_count(params):,} params)")
        with timer.stage("pretrain_joint"):
            result = _fit_multimodal_stage(
                cfg=cfg, ts=ts, tx=tx, wave=pool.wave, isi=pool.isi, source=pool.source,
                class_=pool.source, train_indices=tr_idx, val_indices=va_idx,
                batch_size=cfg.batch_size, max_epochs=cfg.pretrain_max_epochs,
                use_class_labels=False, shuffle_train=True, stage_seed=10,
                resume_dir=_stage_resume_dir(cfg, "pretrain_joint"),
                lr=cfg.learning_rate,
                aot_extra=f"clip={cfg.gradient_clip_val}",
            )
        tracker.update_from_fit(result, template, (cfg.learning_rate, cfg.weight_decay))
        # Fallback to the last state for the max_epochs=0 edge (tracker empty),
        # mirroring the unimodal stage-1 guard.
        state = step.TrainState(
            tracker.best_params if tracker.best_params is not None else result.state.params,
            tracker.best_bn if tracker.best_bn is not None else result.state.bn_state,
            None,
        )
        prev_opt = tracker.best_opt if tracker.best_params is not None else result.best_opt_state

    target = load_dataset(cfg, cfg.dataset, dropna=True)
    target_source_id = registry.DATASET_SOURCE_IDS.get(cfg.dataset, 0)
    target = ArrayDataset(
        wave=target.wave, isi=target.isi,
        source=jnp.full((len(target),), target_source_id, jnp.int32),
    )

    ft_lr = cfg.learning_rate / 10.0
    if cfg.finetune_without_labels:
        ft_tr, ft_va = _finetune_split_indices(cfg, len(target), jax.random.fold_in(root, 1))
        tx = optim.make_optimizer(ft_lr, cfg.weight_decay, cfg.gradient_clip_val, state_dtype=cfg.opt_state_dtype, algorithm=cfg.optimizer)
        ts = _stage_fork(cfg, state.params, state.bn_state, tx, prev_opt)
        if cfg.verbose:
            print(f"[stage 2] fine-tuning joint model on {cfg.dataset} (lr={ft_lr})")
        with timer.stage("finetune_joint"):
            result = _fit_multimodal_stage(
                cfg=cfg, ts=ts, tx=tx, wave=target.wave, isi=target.isi,
                source=target.source, class_=target.source,
                train_indices=ft_tr, val_indices=ft_va, batch_size=cfg.batch_size,
                max_epochs=cfg.finetune_max_epochs, use_class_labels=False,
                shuffle_train=False, stage_seed=20,
                resume_dir=_stage_resume_dir(cfg, "finetune_joint"),
                lr=ft_lr,
                aot_extra=f"clip={cfg.gradient_clip_val}",
            )
        tracker.update_from_fit(result, template, (ft_lr, cfg.weight_decay))
        # Multimodal stage 2 reloads the best ckpt and embeds the fine-tune
        # TEST split (…multimodal.py:772-777). Same tracker-empty fallback as
        # every sibling handoff (max_epochs=0 / all-NaN-val edge).
        state = step.TrainState(
            tracker.best_params if tracker.best_params is not None else result.state.params,
            tracker.best_bn if tracker.best_bn is not None else result.state.bn_state,
            None,
        )
        emb_idx = jnp.asarray(ft_va)
    else:
        emb_idx = jnp.arange(len(target))

    ft_joint = np.asarray(
        emb.embed_multimodal(
            state.params, state.bn_state,
            target.wave[emb_idx], target.isi[emb_idx], target.source[emb_idx],
            mesh=_eval_mesh(cfg),
        )
    )
    pretrain_paths = export_pretraining_embeddings(cfg, {"joint": ft_joint})

    # Stage 3
    sup_wf, sup_isi = registry.load_raw(
        cfg.data_root, cfg.dataset, drop_index_column=cfg.drop_index_column
    )  # no dropna (Q13)
    sup_wave, sup_isi_p = preprocess.preprocess_pair(jnp.asarray(sup_wf), jnp.asarray(sup_isi))
    sup_labels, le = registry.load_supervised_labels(cfg.data_root, cfg.dataset)
    n = len(sup_wf)
    s_tr, s_va = train_val_split(n, cfg.train_val_split, jax.random.fold_in(root, 2))
    label_train = sup_labels[s_tr]
    label_val = sup_labels[s_va]
    num_class_labels = int(len(np.unique(label_train)))

    mm_cfg_sup = cvae.MultiModalConfig(
        z_dim=cfg.z_dim, class_hidden_dim=cfg.class_hidden_dim,
        num_sources=num_sources, num_classes=num_class_labels,
        num_blocks=tuple(cfg.num_blocks),
    )
    template = _init_multimodal(jax.random.fold_in(root, 200), mm_cfg_sup)
    # Direct device-resident handoff of the cross-stage best trees (see
    # _seed_from_best); the stage-1/2 ckpt write overlaps the supervised fit.
    src_p = tracker.best_params if tracker.best_params is not None else state.params
    src_bn = tracker.best_bn if tracker.best_bn is not None else state.bn_state
    params, bn = _seed_from_best(src_p, src_bn, template)
    tracker.flush_async()
    tx = optim.make_optimizer(ft_lr, cfg.weight_decay, cfg.gradient_clip_val, state_dtype=cfg.opt_state_dtype, algorithm=cfg.optimizer)
    ts = (_sf_fork_state(params, bn, tx, tracker.best_opt, drop=("class_embedding",))
          if cfg.optimizer == "schedule-free" and tracker.best_opt is not None
          else step.TrainState(params, bn, jax.jit(tx.init)(params)))
    stream = sampling.balanced_indices(label_train, seed=cfg.seed)
    train_stream = np.asarray(s_tr)[stream]
    labels_dev = jnp.asarray(sup_labels.astype(np.int32))
    source_dev = jnp.full((n,), target_source_id, jnp.int32)
    sup_tracker = BestTracker(
        os.path.join(cfg.checkpoint_dir, f"{cfg.dataset}_joint_model_supervised.ckpt")
    )
    if cfg.verbose:
        print(f"[stage 3] supervised joint training ({num_class_labels} classes)")
    with timer.stage("supervised_joint"):
        result = _fit_multimodal_stage(
            cfg=cfg, ts=ts, tx=tx, wave=sup_wave, isi=sup_isi_p, source=source_dev,
            class_=labels_dev, train_indices=np.asarray(s_tr), val_indices=np.asarray(s_va),
            batch_size=cfg.supervised_batch_size, max_epochs=cfg.supervised_max_epochs,
            use_class_labels=True, shuffle_train=False,
            fixed_train_stream=train_stream, stage_seed=30,
            resume_dir=_stage_resume_dir(cfg, "supervised_joint"),
            lr=ft_lr,
            aot_extra=f"clip={cfg.gradient_clip_val}",
        )
    sup_tracker.update_from_fit(result, template, (ft_lr, cfg.weight_decay))
    sup_tracker.flush_async()  # overlaps the eval / export phase below
    best_p = sup_tracker.best_params if sup_tracker.best_params is not None else result.state.params
    best_bn = sup_tracker.best_bn if sup_tracker.best_bn is not None else result.state.bn_state

    # Reference extracts stage-3 embeddings WITH class conditioning (the
    # label leak, …multimodal.py:855-907); cfg.honest_eval opts out — same
    # contract as the unimodal path.
    emb_cls_tr = None if cfg.honest_eval else labels_dev[jnp.asarray(s_tr)]
    emb_cls_va = None if cfg.honest_eval else labels_dev[jnp.asarray(s_va)]
    joint_tr = np.asarray(
        emb.embed_multimodal(
            best_p, best_bn, sup_wave[jnp.asarray(s_tr)], sup_isi_p[jnp.asarray(s_tr)],
            source_dev[jnp.asarray(s_tr)], emb_cls_tr, mesh=_eval_mesh(cfg),
        )
    )
    joint_va = np.asarray(
        emb.embed_multimodal(
            best_p, best_bn, sup_wave[jnp.asarray(s_va)], sup_isi_p[jnp.asarray(s_va)],
            source_dev[jnp.asarray(s_va)], emb_cls_va, mesh=_eval_mesh(cfg),
        )
    )

    neighbor_options = list(range(5, 20))
    preds = knn_eval.knn_predict_sweep(
        joint_tr, label_train, joint_va, neighbor_options, mesh=_eval_mesh(cfg))
    accs = [metrics.balanced_accuracy_score(label_val, preds[k]) for k in neighbor_options]
    best_k = neighbor_options[int(np.argmax(accs))]
    pred = preds[best_k]
    cm = metrics.confusion_matrix(label_val, pred, labels=np.arange(len(le.classes_)))

    results: Dict[str, Any] = {
        "label_encoder": le,
        "neighbor_options": neighbor_options,
        "balanced_accuracy": {"joint": accs},
        "best": {
            "joint": {
                "k": best_k,
                "balanced_accuracy": float(np.max(accs)),
                "confusion_matrix": cm,
                "pred": pred,
            }
        },
        "paths": {"pretraining_embeddings": pretrain_paths},
        "num_class_labels": num_class_labels,
        "checkpoints": {"joint": tracker.path},
        "supervised_checkpoints": {"joint": sup_tracker.path},
        "label_val": label_val,
        "label_train": label_train,
    }
    results["paths"]["joint_knn"] = export_knn_csv(cfg, "joint", pred, label_val, le)

    joint_all = np.asarray(
        emb.embed_multimodal(
            best_p, best_bn, sup_wave, sup_isi_p, source_dev,
            None if cfg.honest_eval else labels_dev, mesh=_eval_mesh(cfg),
        )
    )
    results["paths"]["joint_embeddings"] = export_embeddings_csv(cfg, "joint", joint_all, sup_labels, le)
    with timer.stage("ckpt_save"):
        tracker.flush()
        sup_tracker.flush()
    results["timings"] = dict(timer.timings)
    if cfg.verbose and timer.timings:
        print("stage timings:", timer.summary())
    return results


def run_pipeline(cfg: PipelineConfig) -> Dict[str, Any]:
    if cfg.model_type == "multimodal":
        if cfg.stage1_wave_ckpt or cfg.stage1_time_ckpt:
            raise ValueError(
                "--stage1-{wave,time}-ckpt seed the UNIMODAL pipeline's "
                "stage 1; the multimodal pipeline takes --stage1-joint-ckpt")
        return run_multimodal_pipeline(cfg)
    if cfg.stage1_joint_ckpt:
        raise ValueError(
            "--stage1-joint-ckpt seeds the MULTIMODAL pipeline's stage 1; "
            "the unimodal pipeline takes --stage1-{wave,time}-ckpt")
    return run_unimodal_pipeline(cfg)
