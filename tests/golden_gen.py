"""Generate frozen parity goldens from the torch reference (run once, commit).

Imports the reference implementation at /root/reference (read-only) with a
stubbed ``pytorch_lightning`` module, runs it on CPU with fixed seeds, and
freezes inputs/outputs/state_dicts as .npz under tests/goldens/. The pytest
suite then verifies our TPU-native implementation against these fixtures with
no runtime dependency on the reference.

Usage:  python tests/golden_gen.py
"""

from __future__ import annotations

import pathlib
import sys
import types

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
OUT = HERE / "goldens"
REFERENCE = pathlib.Path("/root/reference")


def _stub_lightning():
    """Install a minimal pytorch_lightning stub so hippie/model.py imports."""
    import torch.nn as nn

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = nn.Module
    utilities = types.ModuleType("pytorch_lightning.utilities")
    utilities.grad_norm = lambda *a, **k: {}
    pl.utilities = utilities
    sys.modules.setdefault("pytorch_lightning", pl)
    sys.modules.setdefault("pytorch_lightning.utilities", utilities)


def main():
    assert REFERENCE.exists(), "reference checkout not present"
    OUT.mkdir(exist_ok=True)
    sys.path.insert(0, str(REFERENCE))
    _stub_lightning()

    import torch
    import torch.nn.functional as F
    import pandas as pd
    from hippie.backbones import ResNet18Enc, ResNet18Dec  # reference modules
    from hippie.model import hippieUnimodalCVAE, MultiModalCVAE
    from hippie.dataloading import EphysDatasetLabeled

    torch.manual_seed(1234)
    rng = np.random.default_rng(0)

    # ------------------------------------------------------------------
    # 1. Preprocessing goldens: raw CSV rows -> reference dataset outputs
    # ------------------------------------------------------------------
    for ds in ("cellexplorer-celltype", "extracellular-mouse-a1"):
        wf = pd.read_csv(REFERENCE / "datasets" / ds / "waveforms.csv").to_numpy()
        isi = pd.read_csv(REFERENCE / "datasets" / ds / "isi_dist.csv").to_numpy()
        n = min(32, len(wf))
        wf, isi = wf[:n], isi[:n]
        labels = np.zeros(n, dtype=np.int64)
        out = {"raw_wf": wf, "raw_isi": isi}
        for norm in (False, True):
            dsw = EphysDatasetLabeled(wf, isi, labels, mode="wave", normalize=norm)
            dst = EphysDatasetLabeled(wf, isi, labels, mode="time", normalize=norm)
            try:
                out[f"wave_norm{int(norm)}"] = np.stack(
                    [dsw[i][0].numpy().reshape(-1) for i in range(n)]
                )
                out[f"isi_norm{int(norm)}"] = np.stack(
                    [dst[i][0].numpy().reshape(-1) for i in range(n)]
                )
            except TypeError:
                # The reference's normalize=True path calls np.min on a torch
                # tensor, which crashes under numpy>=2 (and is unused by every
                # shipped script — they all pass normalize=False). Skip; the
                # normalize semantics are covered by a local derivation in
                # tests/test_preprocess.py.
                print(f"  note: normalize={norm} path crashed in reference; skipped")
        np.savez_compressed(OUT / f"preprocess_{ds}.npz", **out)
        print(f"preprocess_{ds}: wf {wf.shape} isi {isi.shape}")

    # ------------------------------------------------------------------
    # 2. Backbone forward goldens (eval + train mode)
    # ------------------------------------------------------------------
    enc = ResNet18Enc(z_dim=10)
    dec = ResNet18Dec(z_dim=10, output_size=50)
    x = torch.tensor(rng.normal(size=(16, 1, 50)).astype(np.float32))
    zin = torch.tensor(rng.normal(size=(16, 20)).astype(np.float32))

    def sd_np(m):
        return {k: v.detach().cpu().numpy().copy() for k, v in m.state_dict().items()}

    enc_sd_init, dec_sd_init = sd_np(enc), sd_np(dec)

    enc.eval(), dec.eval()
    with torch.no_grad():
        enc_out_eval = enc(x).numpy()
        dec_out_eval = dec(zin).numpy()
    enc.train(), dec.train()
    enc_out_train = enc(x).detach().numpy()  # also updates running stats
    dec_out_train = dec(zin).detach().numpy()

    np.savez_compressed(
        OUT / "backbones.npz",
        x=x.numpy(),
        zin=zin.numpy(),
        enc_out_eval=enc_out_eval,
        dec_out_eval=dec_out_eval,
        enc_out_train=enc_out_train,
        dec_out_train=dec_out_train,
        **{f"enc_sd.{k}": v for k, v in enc_sd_init.items()},
        **{f"dec_sd.{k}": v for k, v in dec_sd_init.items()},
        **{f"enc_sd_after.{k}": v for k, v in sd_np(enc).items()},
        **{f"dec_sd_after.{k}": v for k, v in sd_np(dec).items()},
    )
    print("backbones golden done; enc params", sum(p.numel() for p in enc.parameters()))

    # ------------------------------------------------------------------
    # 3. Unimodal cVAE: deterministic forward (eps=0) + loss + one AdamW step
    # ------------------------------------------------------------------
    torch.manual_seed(42)
    model = hippieUnimodalCVAE(z_dim=10, output_size=50, class_hidden_dim=5, num_sources=5, num_classes=5)
    data = torch.tensor(rng.normal(size=(32, 1, 50)).astype(np.float32))
    source_labels = torch.tensor(rng.integers(0, 5, size=32))
    class_labels = torch.tensor(rng.integers(0, 5, size=32))
    eps = rng.normal(size=(32, 10)).astype(np.float32)  # injected reparam noise

    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t: torch.tensor(eps[: t.shape[0], : t.shape[1]])
    try:
        model.eval()
        with torch.no_grad():
            enc0, mu0, logvar0, dec0 = model(data, source_labels, class_labels)
            encn, mun, logvarn, decn = model(data, source_labels)  # no class labels

        sd0 = sd_np(model)

        # train-mode forward + loss + single AdamW step (lr=1e-3, wd=0.01)
        model.train()
        opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.01)
        enc1, mu1, logvar1, dec1 = model(data, source_labels, class_labels)
        mse = F.mse_loss(data, dec1)
        kl = -0.5 * torch.sum(1 + logvar1 - mu1.pow(2) - torch.exp(logvar1), axis=1)
        loss = mse + 1.0 * kl.mean()  # beta=1 (model.py default; quirk Q6)
        opt.zero_grad()
        loss.backward()
        grads = {
            name: p.grad.detach().numpy().copy()
            for name, p in model.named_parameters()
        }
        opt.step()
        sd1 = sd_np(model)
    finally:
        torch.randn_like = orig_randn_like

    np.savez_compressed(
        OUT / "unimodal_cvae.npz",
        data=data.numpy(),
        source_labels=source_labels.numpy(),
        class_labels=class_labels.numpy(),
        eps=eps,
        enc_eval=enc0.numpy(), mu_eval=mu0.numpy(), logvar_eval=logvar0.numpy(), dec_eval=dec0.numpy(),
        enc_eval_nocls=encn.numpy(), dec_eval_nocls=decn.numpy(),
        loss=loss.detach().numpy(), mse=mse.detach().numpy(), kl_mean=kl.mean().detach().numpy(),
        enc_train=enc1.detach().numpy(), dec_train=dec1.detach().numpy(),
        **{f"sd0.{k}": v for k, v in sd0.items()},
        **{f"sd1.{k}": v for k, v in sd1.items()},
        **{f"grad.{k}": v for k, v in grads.items()},
    )
    print("unimodal golden done; params", sum(p.numel() for p in model.parameters()),
          "loss", float(loss))

    # ------------------------------------------------------------------
    # 4. Multimodal cVAE: deterministic forward + loss
    # ------------------------------------------------------------------
    torch.manual_seed(7)
    mm = MultiModalCVAE(z_dim=10, output_size_wave=50, output_size_isi=100,
                        class_hidden_dim=5, num_sources=5, num_classes=5)
    d1 = torch.tensor(rng.normal(size=(16, 1, 50)).astype(np.float32))
    d2 = torch.tensor(rng.normal(size=(16, 1, 100)).astype(np.float32))
    sl = torch.tensor(rng.integers(0, 5, size=16))
    cl = torch.tensor(rng.integers(0, 5, size=16))
    eps2 = rng.normal(size=(16, 10)).astype(np.float32)
    torch.randn_like = lambda t: torch.tensor(eps2[: t.shape[0], : t.shape[1]])
    try:
        mm.eval()
        with torch.no_grad():
            menc, mmu, mlogvar, mdec1, mdec2 = mm(d1, d2, sl, cl)
        mse1 = F.mse_loss(d1, mdec1)
        mse2 = F.mse_loss(d2, mdec2)
        mkl = -0.5 * torch.sum(1 + mlogvar - mmu.pow(2) - torch.exp(mlogvar), axis=1)
        mloss = 1.0 * mse1 + 1.0 * mse2 + 1.0 * mkl.mean()
    finally:
        torch.randn_like = orig_randn_like
    np.savez_compressed(
        OUT / "multimodal_cvae.npz",
        d1=d1.numpy(), d2=d2.numpy(), sl=sl.numpy(), cl=cl.numpy(), eps=eps2,
        enc=menc.numpy(), mu=mmu.numpy(), logvar=mlogvar.numpy(),
        dec1=mdec1.numpy(), dec2=mdec2.numpy(),
        loss=mloss.numpy(), mse1=mse1.numpy(), mse2=mse2.numpy(),
        **{f"sd.{k}": v for k, v in sd_np(mm).items()},
    )
    print("multimodal golden done; params", sum(p.numel() for p in mm.parameters()))


if __name__ == "__main__":
    main()
