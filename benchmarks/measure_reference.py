"""Measure the PyTorch reference's training throughput on matched configs.

The reference repo publishes no numbers (BASELINE.md), so the baseline is
measured by running the reference implementation itself (imported from the
read-only snapshot) for optimizer steps on synthetic tensors of the
flagship shape (3-modality MoPoE, 128px, word text, DIM 64, class_dim 64).

Single-cell mode writes BASELINE_MEASURED[_COMPILED].json for one
(batch, lr); ``--sweep`` measures the full grid batch {16,64,128} ×
lr {5e-4,1e-4} for BOTH eager and compiled and records every cell plus
the STRONGEST floor (max samples/sec) as the file's headline
``reference_samples_per_sec`` — bench.py divides by the strongest floor
across both files and names it in its protocol string (VERDICT r4 #4:
the graded ratio must cite the strongest measured reference floor, with
finite losses at the healthy lr in the artifact).

Usage: python benchmarks/measure_reference.py [--batch 16] [--steps 10]
       [--lr 5e-4] [--compile] | [--sweep]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("MOPOE_REFERENCE", "/root/reference")
sys.path.insert(0, REFERENCE)
# losses.py uses non-package imports ("from evaluation...", losses.py:2-3)
sys.path.insert(0, os.path.join(REFERENCE, "mimic"))


def _install_stubs():
    """The bare image has no torchvision; the reference imports it at
    module scope (CheXNet.py:8, Modality.py) but this benchmark never
    calls into those paths — stub just enough for import to succeed."""
    import types

    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.transforms.Compose = lambda *a, **k: (lambda x: x)
    tv.transforms.ToPILImage = lambda *a, **k: (lambda x: x)
    tv.transforms.Resize = lambda *a, **k: (lambda x: x)
    tv.transforms.ToTensor = lambda *a, **k: (lambda x: x)
    tv.transforms.Normalize = type(
        "Normalize", (),
        {"__init__": lambda self, *a, **k: None,
         "__call__": lambda self, x: x})
    tv.transforms.CenterCrop = lambda *a, **k: (lambda x: x)
    tv.transforms.FiveCrop = lambda *a, **k: (lambda x: x)
    tv.transforms.TenCrop = lambda *a, **k: (lambda x: x)
    tv.transforms.Lambda = lambda f: f
    tv.transforms.Grayscale = lambda *a, **k: (lambda x: x)
    tv.utils = types.ModuleType("torchvision.utils")
    tv.utils.save_image = lambda *a, **k: None
    tv.utils.make_grid = lambda x, *a, **k: x
    tv.__path__ = []
    sys.modules["torchvision.utils"] = tv.utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision.transforms"] = tv.transforms


def measure_cell(batch: int, lr: float, steps: int, warmup: int,
                 compiled: bool, img_size: int = 128,
                 record_curve: bool = False) -> dict:
    """One (batch, lr, mode) measurement: fresh model + Adam, `warmup`
    untimed steps (absorbing inductor compile in compiled mode), then
    `steps` timed optimizer steps of the reference's real loss assembly.
    ``record_curve`` keeps every step's loss (stability studies)."""
    import torch

    # era parity: the reference stack is torch 1.6 (setup.cfg:14-28),
    # where torch.distributions did NOT validate args by default; modern
    # torch's validate_args=True turns a diverging run's softmax into a
    # Simplex-constraint crash instead of the NaN loss the reference
    # would have produced (and which its NaN-restart driver expects,
    # main_mimic.py:100-124)
    torch.distributions.Distribution.set_default_validate_args(False)

    _install_stubs()

    from mimic.evaluation.losses import (
        calc_joint_elbo_loss, calc_klds, calc_log_probs,
    )
    from mimic.modalities.MimicLateral import MimicLateral
    from mimic.modalities.MimicPA import MimicPA
    from mimic.modalities.MimicText import MimicText
    from mimic.networks.ConvNetworksImgMimic import DecoderImg, EncoderImg
    from mimic.networks.ConvNetworksTextMimic import DecoderText, EncoderText
    from mimic.networks.VAEtrimodalMimic import VAEtrimodalMimic
    from mimic.utils.filehandling import get_method
    from mimic.utils.flags import flags_set_alpha_modalities, parser

    flags = parser.parse_args([])
    flags.method = "joint_elbo"
    flags = get_method(flags)
    flags.img_size = img_size
    flags.DIM_img = 64
    flags.DIM_text = 64
    flags.class_dim = 64
    flags.text_encoding = "word"
    flags.len_sequence = 128
    flags.vocab_size = 3517
    flags.batch_size = batch
    flags.device = torch.device("cpu")
    flags.initial_learning_rate = lr
    flags = flags_set_alpha_modalities(flags)

    torch.manual_seed(0)
    mod1 = MimicPA(EncoderImg(flags, flags.style_pa_dim),
                   DecoderImg(flags, flags.style_pa_dim), flags)
    mod2 = MimicLateral(EncoderImg(flags, flags.style_lat_dim),
                        DecoderImg(flags, flags.style_lat_dim), flags)
    mod3 = MimicText(EncoderText(flags, flags.style_text_dim),
                     DecoderText(flags, flags.style_text_dim),
                     flags.len_sequence, torch.Size((1, 128, 128)), None,
                     flags)
    mods = {"PA": mod1, "Lateral": mod2, "text": mod3}

    from itertools import chain, combinations

    names = list(mods)
    subsets = {}
    for combo in chain.from_iterable(
            combinations(names, n) for n in range(len(names) + 1)):
        subsets["_".join(sorted(combo))] = [mods[m] for m in sorted(combo)]

    model = VAEtrimodalMimic(flags, mods, subsets)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=lr,
                           betas=(flags.beta_1, flags.beta_2))

    class Exp:  # minimal experiment shim for the loss functions
        pass

    exp = Exp()
    exp.flags = flags
    exp.modalities = mods
    exp.rec_weights = {"PA": flags.rec_weight_m1,
                       "Lateral": flags.rec_weight_m2,
                       "text": flags.rec_weight_m3}
    exp.style_weights = {"PA": flags.beta_m1_style,
                         "Lateral": flags.beta_m2_style,
                         "text": flags.beta_m3_style}

    torch.manual_seed(0)
    batch_d = {
        "PA": torch.rand(batch, 1, img_size, img_size),
        "Lateral": torch.rand(batch, 1, img_size, img_size),
        "text": torch.randint(0, flags.vocab_size, (batch, 128)).float(),
    }
    tb = [batch_d, None]

    fwd = torch.compile(model) if compiled else model

    def step():
        results = fwd(batch_d)
        log_probs, weighted_log_prob = calc_log_probs(exp, results, tb)
        group_divergence = results["joint_divergence"]
        _klds = calc_klds(exp, results)
        total = calc_joint_elbo_loss(exp, None, group_divergence,
                                     flags.beta_style, flags.beta_content,
                                     weighted_log_prob, flags.beta)
        opt.zero_grad()
        total.backward()
        opt.step()
        return float(total)

    curve = []
    for _ in range(warmup):
        first_loss = step()
    t0 = time.perf_counter()
    for i in range(steps):
        loss = step()
        if record_curve:
            curve.append(loss)
            if loss != loss or abs(loss) > 1e30:
                break  # diverged — record onset, stop burning CPU
    dt = time.perf_counter() - t0
    out = {
        "batch": batch, "lr": lr, "steps": steps,
        "img_size": img_size,
        "mode": "compiled" if compiled else "eager",
        "samples_per_sec": batch * steps / dt,
        "first_loss": first_loss, "last_loss": loss,
        "finite": bool(loss == loss and abs(loss) < 1e30),
    }
    if record_curve:
        out["loss_curve"] = curve
        bad = [i for i, v in enumerate(curve)
               if v != v or abs(v) > 1e10]
        out["divergence_step"] = bad[0] if bad else None
    return out


CONFIG = {"method": "joint_elbo", "img_size": 128, "DIM_img": 64,
          "DIM_text": 64, "class_dim": 64, "text_encoding": "word"}


def _write(fname: str, cells, hardware: str):
    # headline floor = strongest HEALTHY cell (finite last_loss,
    # VERDICT r4 #4): a diverged run measures the same FLOPs, but the
    # graded ratio should cite a floor the reference could actually
    # train at; fall back to all cells only if every one diverged
    finite = [c for c in cells if c.get("finite")]
    strongest = max(finite or cells, key=lambda c: c["samples_per_sec"])
    out = {
        # headline = STRONGEST floor; bench.py divides by this
        "reference_samples_per_sec": strongest["samples_per_sec"],
        "reference_hardware": hardware,
        "strongest_cell": {k: strongest[k] for k in ("batch", "lr", "mode")},
        "config": CONFIG,
        "cells": cells,
        # healthy-floor evidence: finite loss at the stable lr
        "finite_loss_cells": sum(c["finite"] for c in cells),
        "last_loss": strongest["last_loss"],
    }
    with open(os.path.join(REPO, fname), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"file": fname,
                      "reference_samples_per_sec": out["reference_samples_per_sec"],
                      "strongest_cell": out["strongest_cell"]}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--compile", action="store_true",
                    help="torch.compile the model (inductor) — the "
                    "modern-torch CPU floor; writes "
                    "BASELINE_MEASURED_COMPILED.json")
    ap.add_argument("--sweep", action="store_true",
                    help="full grid batch {16,64,128} x lr {5e-4,1e-4} "
                    "for both eager and compiled; writes both files")
    ap.add_argument("--stability-256", action="store_true",
                    help="run the torch reference at 256px / lr 5e-4 on "
                    "random inputs and record the loss curve — measures "
                    "whether the reference exhibits the SAME 1x1-BN "
                    "divergence docs/STABILITY.md documents for this "
                    "architecture (VERDICT r4 #7); writes "
                    "docs/STABILITY_TORCH_256.json")
    args = ap.parse_args()

    if args.stability_256:
        cells = []
        for lr in (5e-4, 1e-4):
            cell = measure_cell(args.batch, lr, args.steps, warmup=1,
                                compiled=False, img_size=256,
                                record_curve=True)
            print(json.dumps(cell), flush=True)
            cells.append(cell)
        out_path = os.path.join(REPO, "docs", "STABILITY_TORCH_256.json")
        with open(out_path, "w") as f:
            json.dump({"cells": cells}, f, indent=2)
        print(json.dumps({"file": out_path}))
        return

    if not args.sweep:
        cell = measure_cell(args.batch, args.lr, args.steps, args.warmup,
                            args.compile)
        hw = ("cpu (torch.compile/inductor)" if args.compile
              else "cpu (torch eager; reference was GPU-era torch 1.6)")
        _write("BASELINE_MEASURED_COMPILED.json" if args.compile
               else "BASELINE_MEASURED.json", [cell], hw)
        return

    grid = [(b, lr) for b in (16, 64, 128) for lr in (5e-4, 1e-4)]
    for compiled, fname, hw in (
        (False, "BASELINE_MEASURED.json",
         "cpu (torch eager; reference was GPU-era torch 1.6)"),
        (True, "BASELINE_MEASURED_COMPILED.json",
         "cpu (torch.compile/inductor)"),
    ):
        cells = []
        for b, lr in grid:
            t0 = time.time()
            try:
                cell = measure_cell(b, lr, args.steps, args.warmup, compiled)
            except Exception as e:  # a cell diverging must not kill the sweep
                cell = {"batch": b, "lr": lr,
                        "mode": "compiled" if compiled else "eager",
                        "samples_per_sec": 0.0, "finite": False,
                        "last_loss": None, "error": repr(e)[:300]}
            cell["wall_sec"] = round(time.time() - t0, 1)
            cells.append(cell)
            print(json.dumps(cell), flush=True)
        _write(fname, cells, hw)


if __name__ == "__main__":
    main()
