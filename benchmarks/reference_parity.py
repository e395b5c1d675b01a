"""Head-to-head TRAINING parity vs the actual reference.

Round-3 review: forward-pass parity is proven (torch checkpoint import,
output-identical — tools/torch_import.py), but nothing ever TRAINED the
reference (/root/reference/trainer.py:23-392 via the modular pipeline)
and seld_tpu on the same corpus with matched hyperparameters and
compared trajectories/end metrics. This study does exactly that, at
reduced scale, on CPU (both sides — removes the device variable):

  * one synthetic FOA corpus (data/synthetic.py — SN3D-panned events,
    doa_step_deg=45, event_rate 0.4/s) written as WAV/CSV pairs in the
    exact format the reference parses (dataset.py:18-25, 60-119: rows
    of (meta_frame@100ms, class, source, az, el), no header);
  * the reference's OWN modules run the torch side: SELDDataset
    (dataset.py:167-330), train_model (trainer.py:23-392), test_model
    (trainer.py:394-711), with its module-level Config singletons
    patched to the matched hparams and checkpoint/output dirs pointed
    at a temp dir (/root/reference is read-only);
  * matched hyperparameters on both sides: CRNN backbone at reduced
    width (same channel/hidden/layer/dropout settings through both
    config systems), CE loss with the reference's event=1.0 /
    background=0.05 class weights (trainer.py:99-101), Adam lr=1e-3
    wd=1e-4, ReduceLROnPlateau(0.5, patience 5), batch 16, same number
    of epochs, plain 4-channel log-mel features (the reference has no
    spatial features), no augmentation/EMA on the seld side;
  * compared: per-epoch train/test loss trajectories (weighted CE on
    both sides — the reference's final test_model loss is excluded
    from deltas because it rebuilds the criterion WITHOUT class
    weights, trainer.py:482-488), and the reference's own accuracy
    metrics (overall + non-background cell accuracy,
    trainer.py:541-556) on BOTH the held-out test windows and the
    train windows, for BOTH the best checkpoint (what each framework's
    selection kept) and the last rolling checkpoint (what training
    actually learned by the end) — the two can diverge sharply when
    the test-loss curve dips early (right after the background prior
    is learned) and recovers slowly: best-ckpt selection then returns
    an all-background model even though the final weights detect
    events (measured: reference_parity_e40_c2x60s_r1.0.json, where the
    reference's best epoch is 2); at this deliberately small scale both frameworks
    memorize train events and decode test scenes to background, and
    parity means they agree on both behaviors, not that either
    generalizes (the capstone with ACS/SpecAugment is the
    generalization evidence).

torchaudio is not installed in this environment, so the study installs
a minimal semantics-faithful shim before importing the reference:
torch.stft with torchaudio MelSpectrogram defaults (hann periodic,
center=True reflect pad, power=2, HTK mel scale, norm=None — the same
semantics seld_tpu/features/mel.py implements and golden-tests to
<=0.05 dB against an f64 oracle) and AmplitudeToDB power mode. The
shim is pure torch, independent of the JAX implementation.

Loss values ARE directly comparable: seld_tpu's weighted CE replicates
torch's weighted-mean reduction (golden-tested in tests/test_losses.py
against a literal torch oracle).

Expected outcome: trajectories agree in shape and end metrics within a
band set by init/shuffle/dropout RNG differences (the two frameworks
cannot share a PRNG); the artifact records both series and the deltas.

Run on CPU from the repo root:  python benchmarks/reference_parity.py
(~10-20 min; keep it off the chip — no TPU needed).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import types
from pathlib import Path

REPO = Path(__file__).parent.parent
RESULTS = REPO / "benchmarks" / "results"
REFERENCE = Path("/root/reference")

sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import torch  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# torchaudio shim (semantics of the reference's defaults, pure torch)
# ---------------------------------------------------------------------------

def install_torchaudio_shim():
    from seld_tpu.data.audio import load_wav
    from seld_tpu.features.mel import mel_filterbank

    ta = types.ModuleType("torchaudio")
    tr = types.ModuleType("torchaudio.transforms")

    def _load(path):
        wave, sr = load_wav(path)  # (C, N) float32 in [-1, 1]
        return torch.from_numpy(np.asarray(wave)), sr

    class MelSpectrogram(torch.nn.Module):
        """torchaudio.transforms.MelSpectrogram defaults: hann periodic
        window, center=True reflect pad, power=2, onesided,
        mel_scale='htk', norm=None (ref dataset.py:38-43 passes only
        sample_rate/n_fft/hop_length/n_mels)."""

        def __init__(self, sample_rate, n_fft, hop_length, n_mels):
            super().__init__()
            self.n_fft, self.hop = n_fft, hop_length
            self.window = torch.hann_window(n_fft, periodic=True)
            # (n_freqs, n_mels) -> transpose to (n_mels, n_freqs)
            fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate)
            self.fb = torch.from_numpy(np.asarray(fb.T, np.float32))

        def forward(self, x):  # (1, N) -> (1, n_mels, T)
            spec = torch.stft(
                x, self.n_fft, hop_length=self.hop, window=self.window,
                center=True, pad_mode="reflect", onesided=True,
                return_complex=True, normalized=False,
            )
            power = spec.real**2 + spec.imag**2  # (1, bins, T)
            return torch.einsum("mf,cft->cmt", self.fb, power)

    class AmplitudeToDB(torch.nn.Module):
        """Power mode, ref_value=1, top_db=None (reference default ctor,
        dataset.py:56)."""

        def forward(self, x):
            return 10.0 * torch.log10(torch.clamp(x, min=1e-10))

    tr.MelSpectrogram = MelSpectrogram
    tr.AmplitudeToDB = AmplitudeToDB
    ta.transforms = tr
    ta.load = _load
    ta.__version__ = "shim-for-reference-parity"
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = tr


# ---------------------------------------------------------------------------
# matched hyperparameters
# ---------------------------------------------------------------------------

import os

EPOCHS = int(os.environ.get("PARITY_EPOCHS", "12"))
BATCH = 16
CRNN_CHANNELS = [16, 32, 64, 128]
CRNN_HIDDEN = 64
CRNN_LAYERS = 2
CRNN_DROPOUT = 0.3
N_TRAIN_CLIPS = int(os.environ.get("PARITY_TRAIN_CLIPS", "2"))
TRAIN_SECONDS = float(os.environ.get("PARITY_TRAIN_SECONDS", "40"))
N_TEST_CLIPS, TEST_SECONDS = 1, 40.0
DOA_STEP = 45
EVENT_RATE = float(os.environ.get("PARITY_EVENT_RATE", "0.4"))
_DEFAULT_SCALE = (EPOCHS, N_TRAIN_CLIPS, TRAIN_SECONDS, EVENT_RATE) == (
    12, 2, 40.0, 0.4)
# non-default scales write a scale-stamped artifact so a rerun never
# silently overwrites existing evidence (round-3 advisor lesson)
ARTIFACT = ("reference_parity.json" if _DEFAULT_SCALE else
            f"reference_parity_e{EPOCHS}_c{N_TRAIN_CLIPS}"
            f"x{TRAIN_SECONDS:.0f}s_r{EVENT_RATE}.json")


def make_corpus_files(root: Path):
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data.synthetic import synthetic_raw_files

    cfg = parse_overrides(Config(), [f"data.base_path={root}"])
    train_wavs, train_csvs = synthetic_raw_files(
        root / "train", cfg, n_files=N_TRAIN_CLIPS, seconds=TRAIN_SECONDS,
        seed=0, doa_step_deg=DOA_STEP, event_rate_hz=EVENT_RATE,
    )
    test_wavs, test_csvs = synthetic_raw_files(
        root / "test", cfg, n_files=N_TEST_CLIPS, seconds=TEST_SECONDS,
        seed=100, doa_step_deg=DOA_STEP, event_rate_hz=EVENT_RATE,
    )
    return (train_wavs, train_csvs), (test_wavs, test_csvs)


def run_reference(tmp: Path, train_files, test_files) -> dict:
    """Train + test the reference's modular pipeline (CPU torch)."""
    install_torchaudio_shim()
    sys.path.insert(0, str(REFERENCE))
    import dataset as ref_dataset
    import trainer as ref_trainer

    # patch every module-level Config singleton the call path reads;
    # checkpoints/outputs go to OUR temp dir (/root/reference is
    # read-only and must never be written)
    ckpt_dir = tmp / "ref_ckpt"
    out_dir = tmp / "ref_out"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    out_dir.mkdir(parents=True, exist_ok=True)
    for mod in (ref_dataset, ref_trainer):
        c = mod.config
        c.MODEL_TYPE = "crnn"
        c.CRNN_CNN_CHANNELS = list(CRNN_CHANNELS)
        c.CRNN_RNN_HIDDEN = CRNN_HIDDEN
        c.CRNN_RNN_LAYERS = CRNN_LAYERS
        c.CRNN_DROPOUT = CRNN_DROPOUT
        c.LOSS_TYPE = "ce"
        c.NUM_EPOCHS = EPOCHS
        c.BATCH_SIZE = BATCH
        c.CHECKPOINT_PATH = ckpt_dir
        c.OUTPUT_PATH = out_dir

    torch.manual_seed(0)
    train_ds = ref_dataset.SELDDataset(*train_files)
    test_ds = ref_dataset.SELDDataset(*test_files)
    from torch.utils.data import DataLoader

    train_loader = DataLoader(train_ds, batch_size=BATCH, shuffle=True,
                              num_workers=0)
    test_loader = DataLoader(test_ds, batch_size=BATCH, shuffle=False,
                             num_workers=0)
    log(f"reference: {len(train_ds)} train / {len(test_ds)} test windows")

    t0 = time.time()
    _, history = ref_trainer.train_model(train_loader, test_loader,
                                         device=torch.device("cpu"))
    wall = time.time() - t0
    results = ref_trainer.test_model(
        test_loader, model_path=ckpt_dir / "best_model.pth",
        device=torch.device("cpu"), save_visualizations=False,
    )
    # memorization check: the reference's own eval on the TRAIN windows
    # (its test_model takes any loader; shuffle off for determinism)
    train_eval_loader = DataLoader(train_ds, batch_size=BATCH,
                                   shuffle=False, num_workers=0)
    results_train = ref_trainer.test_model(
        train_eval_loader, model_path=ckpt_dir / "best_model.pth",
        device=torch.device("cpu"), save_visualizations=False,
    )
    # learning-vs-selection decomposition: the best checkpoint can land
    # on an early all-background epoch (a test-loss dip right after the
    # background prior is learned) — score the LAST rolling checkpoint
    # too, so "did training learn events at all" is answered separately
    # from "did checkpoint selection keep them"
    rolling = sorted(ckpt_dir.glob("checkpoint_epoch_*.pth"),
                     key=lambda p: int(p.stem.rsplit("_", 1)[1]))
    final = {}
    if rolling:
        final_test = ref_trainer.test_model(
            test_loader, model_path=rolling[-1],
            device=torch.device("cpu"), save_visualizations=False,
        )
        final_train = ref_trainer.test_model(
            train_eval_loader, model_path=rolling[-1],
            device=torch.device("cpu"), save_visualizations=False,
        )
        final = {
            "final_ckpt_epoch": int(rolling[-1].stem.rsplit("_", 1)[1]),
            "final_overall_accuracy": float(final_test["overall_accuracy"]),
            "final_non_bg_accuracy": float(final_test["non_bg_accuracy"]),
            "final_train_overall_accuracy":
                float(final_train["overall_accuracy"]),
            "final_train_non_bg_accuracy":
                float(final_train["non_bg_accuracy"]),
        }
    return {
        **final,
        "train_windows": len(train_ds),
        "test_windows": len(test_ds),
        "wall_s": round(wall, 1),
        "train_losses": [float(x) for x in history["train_losses"]],
        "test_losses": [float(x) for x in history["test_losses"]],
        "best_test_loss": float(history["best_test_loss"]),
        "best_epoch": int(history["best_epoch"]),
        # NOTE: the reference's test_model rebuilds its criterion WITHOUT
        # the class weights train-time uses (trainer.py:482-488), so this
        # loss is unweighted CE — comparable only to another unweighted
        # CE, not to the weighted epoch-loop losses above (a faithful
        # reference quirk, kept as-is).
        "test_loss_unweighted": float(results["test_loss"]),
        "overall_accuracy": float(results["overall_accuracy"]),
        "non_bg_accuracy": float(results["non_bg_accuracy"]),
        "checkpoint_epoch": int(results["checkpoint_epoch"]),
        "train_overall_accuracy": float(results_train["overall_accuracy"]),
        "train_non_bg_accuracy": float(results_train["non_bg_accuracy"]),
    }


def run_seld_tpu(tmp: Path, train_files, test_files) -> dict:
    from seld_tpu.config import Config, parse_overrides
    from seld_tpu.data.corpus import build_corpus
    from seld_tpu.eval import evaluate_model
    from seld_tpu.train import train_model

    cfg = parse_overrides(Config(), [
        "model.model_type=crnn",
        "model.crnn_cnn_channels=" + ",".join(map(str, CRNN_CHANNELS)),
        f"model.crnn_rnn_hidden={CRNN_HIDDEN}",
        f"model.crnn_rnn_layers={CRNN_LAYERS}",
        f"model.crnn_dropout={CRNN_DROPOUT}",
        "model.compute_dtype=float32",  # CPU study; bf16 is TPU-tuned
        "features.feature_set=mel",     # plain log-mel, like the reference
        "loss.loss_type=ce",
        f"train.num_epochs={EPOCHS}",
        f"train.batch_size={BATCH}",
        # Adam 1e-3 / wd 1e-4 / plateau(0.5, 5) / early-stop(20, 1e-4)
        # are the defaults on BOTH sides (ref config.py:62-82) — left
        # explicit-free so a default drift would fail the parity test.
        "train.ema_decay=0.0",
        f"data.base_path={tmp}",
    ])
    train_c = build_corpus(train_files[0], train_files[1], cfg.features,
                           cfg.grid, cfg.window, cfg.targets, train=True)
    test_c = build_corpus(test_files[0], test_files[1], cfg.features,
                          cfg.grid, cfg.window, cfg.targets, train=False)
    log(f"seld_tpu: {len(train_c)} train / {len(test_c)} test windows")

    workdir = tmp / "seld_ckpt"
    t0 = time.time()
    _, history = train_model(cfg, train_c, test_c, workdir=workdir)
    wall = time.time() - t0
    recs = [json.loads(l) for l in
            (workdir / "metrics.jsonl").read_text().splitlines()]
    m = evaluate_model(cfg, test_c, workdir, save_visualizations=False)
    # memorization check: eval on the TRAIN windows (rebuilt train=False:
    # no augmentation path — matches the reference's eval of train data)
    train_eval_c = build_corpus(train_files[0], train_files[1],
                                cfg.features, cfg.grid, cfg.window,
                                cfg.targets, train=False)
    m_tr = evaluate_model(cfg, train_eval_c, workdir,
                          save_visualizations=False)
    # final rolling checkpoint, matching the reference-side decomposition
    m_fin = evaluate_model(cfg, test_c, workdir, save_visualizations=False,
                           use_checkpoint="latest")
    m_fin_tr = evaluate_model(cfg, train_eval_c, workdir,
                              save_visualizations=False,
                              use_checkpoint="latest")
    return {
        "final_ckpt_epoch": int(m_fin["checkpoint_epoch"]),
        "final_overall_accuracy": float(m_fin["overall_accuracy"]),
        "final_non_bg_accuracy": float(m_fin["non_bg_accuracy"]),
        "final_train_overall_accuracy": float(m_fin_tr["overall_accuracy"]),
        "final_train_non_bg_accuracy": float(m_fin_tr["non_bg_accuracy"]),
        "train_windows": len(train_c),
        "test_windows": len(test_c),
        "wall_s": round(wall, 1),
        "train_losses": [r["train"]["loss"] for r in recs],
        "test_losses": [r["test"]["loss"] for r in recs],
        "best_test_loss": min(r["test"]["loss"] for r in recs),
        "best_epoch": min(recs, key=lambda r: r["test"]["loss"])["epoch"],
        "test_loss_weighted": float(m["test_loss"]),
        "overall_accuracy": float(m["overall_accuracy"]),
        "non_bg_accuracy": float(m["non_bg_accuracy"]),
        "checkpoint_epoch": int(m["checkpoint_epoch"]),
        "dcase2022_SELD_error": float(m["dcase2022"]["SELD_error"]),
        "dcase2022_F_macro": float(m["dcase2022"]["F_macro"]),
        "train_overall_accuracy": float(m_tr["overall_accuracy"]),
        "train_non_bg_accuracy": float(m_tr["non_bg_accuracy"]),
    }


def precheck_window_counts(train_files, test_files) -> None:
    """Window-count parity is a hard precondition (same concatenate-
    then-slide-then-pad semantics) — assert it BEFORE either side burns
    train time (dataset/corpus construction is seconds at this scale;
    training is minutes to hours at PARITY_EPOCHS>=40)."""
    install_torchaudio_shim()
    sys.path.insert(0, str(REFERENCE))
    import dataset as ref_dataset

    from seld_tpu.config import Config
    from seld_tpu.data.corpus import build_corpus

    cfg = Config()
    counts = {}
    for name, files in (("train", train_files), ("test", test_files)):
        n_ref = len(ref_dataset.SELDDataset(*files))
        n_seld = len(build_corpus(files[0], files[1], cfg.features,
                                  cfg.grid, cfg.window, cfg.targets,
                                  train=False))
        assert n_ref == n_seld, (name, n_ref, n_seld)
        counts[name] = n_ref
    log(f"window-count precheck ok: {counts}")


def main():
    RESULTS.mkdir(exist_ok=True)
    tmp = Path(tempfile.mkdtemp(prefix="ref_parity_"))
    try:
        train_files, test_files = make_corpus_files(tmp)
        precheck_window_counts(train_files, test_files)
        ref = run_reference(tmp, train_files, test_files)
        log("reference:", json.dumps(ref))
        seld = run_seld_tpu(tmp, train_files, test_files)
        log("seld_tpu:", json.dumps(seld))

        assert ref["train_windows"] == seld["train_windows"], (
            ref["train_windows"], seld["train_windows"])
        assert ref["test_windows"] == seld["test_windows"], (
            ref["test_windows"], seld["test_windows"])

        out = {
            "hparams": {
                "epochs": EPOCHS, "batch": BATCH,
                "crnn_channels": CRNN_CHANNELS, "crnn_hidden": CRNN_HIDDEN,
                "crnn_layers": CRNN_LAYERS, "dropout": CRNN_DROPOUT,
                "loss": "ce (class weights 1.0 / bg 0.05)",
                "optimizer": "adam lr=1e-3 wd=1e-4, plateau(0.5, 5)",
                "corpus": f"{N_TRAIN_CLIPS}x{TRAIN_SECONDS:.0f}s train / "
                          f"{N_TEST_CLIPS}x{TEST_SECONDS:.0f}s test, "
                          f"doa_step={DOA_STEP} rate={EVENT_RATE}/s",
            },
            "reference": ref,
            "seld_tpu": seld,
            "deltas": {
                # weighted-CE epoch-loop losses: like-for-like on both
                # sides (the reference's final test_model loss is
                # UNWEIGHTED CE — its own quirk, see run_reference)
                "best_test_loss":
                    seld["best_test_loss"] - ref["best_test_loss"],
                "overall_accuracy":
                    seld["overall_accuracy"] - ref["overall_accuracy"],
                "non_bg_accuracy":
                    seld["non_bg_accuracy"] - ref["non_bg_accuracy"],
                "train_overall_accuracy":
                    seld["train_overall_accuracy"]
                    - ref["train_overall_accuracy"],
                "train_non_bg_accuracy":
                    seld["train_non_bg_accuracy"]
                    - ref["train_non_bg_accuracy"],
            },
        }
        (RESULTS / ARTIFACT).write_text(
            json.dumps(out, indent=2) + "\n"
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
