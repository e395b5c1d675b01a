"""One-command decode calibration: tune every decode knob on a
validation corpus and write a reusable calibration file.

The reference's eval (`/root/reference/trainer.py:394-711`) has exactly
one decode — plain per-cell argmax. seld_tpu adds decode operating-point
knobs on top of that contract: a background-logit bias for grid models
(`--bg-bias`), a vector-norm activity threshold for ACCDOA families
(`--accdoa-threshold`), decoded-grid temporal median smoothing
(`--median-filter`), ACS test-time augmentation (`--tta`), and int8 PTQ
(`--int8`). Each already has its own `eval` sweep; this module composes
them into the production workflow:

    seld_tpu calibrate ...            -> decode_calibration.json
    seld_tpu predict --calibration F  -> serves the tuned decode
    seld_tpu export  --calibration F  -> bakes the tuned decode into the
                                         StableHLO artifact (from which
                                         `serve --artifact` picks it up)

Calibration runs two eval passes over the validation corpus:

  pass 1  sweeps the model family's operating-point knob (bg_bias for
          grid models, accdoa_threshold for ACCDOA/multi-ACCDOA) under
          the REQUESTED decode composition (TTA/int8) — per-path optima
          differ (see benchmarks/results/flagship_synth_accuracy.json:
          the plain-calibrated bias is +1.0 where the TTA-path optimum
          is +2.0), so the sweep must run through the decode that will
          serve;
  pass 2  fixes the chosen knob and sweeps the median-filter width
          host-side (one forward, every width scored — the filter
          smooths whatever the composed decode produced).

The result records the chosen knobs, the full sweep tables (audit
trail), and the validation metrics at the chosen operating point.
"""

from __future__ import annotations

import json
from pathlib import Path

from seld_tpu.config import Config
from seld_tpu.utils.logging import get_logger

CALIBRATION_VERSION = 1

# Default grids: the bias range brackets every optimum seen in the chip
# studies (+0.5 .. +2.0 across training scales and decode paths, with
# negative headroom for over-confident models); the threshold grid
# brackets the DCASE-baseline 0.5; widths 1 (off) through 7 frames
# (140 ms at 50 fps — past that, short events get smoothed away).
DEFAULT_BIAS_GRID = (-1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0, 3.0)
DEFAULT_THRESHOLD_GRID = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7)
DEFAULT_MEDIAN_WIDTHS = (1, 3, 5, 7)

_METRIC_KEYS = ("ER", "F_macro", "LE_macro", "LR_macro", "SELD_error")


def run_calibration(
    cfg: Config,
    val_corpus,
    checkpoint_dir,
    *,
    tta_transforms=None,
    int8: bool = False,
    int8_weight_only: bool = False,
    bias_grid=None,
    threshold_grid=None,
    median_widths=None,
    use_checkpoint: str = "best",
) -> dict:
    """Two-pass decode calibration (see the module docstring).

    tta_transforms: None = no TTA; a tuple (from
    seld_tpu.tta.validate_transforms) = calibrate the TTA decode path.
    Returns the calibration dict (not yet written to disk)."""
    from seld_tpu.eval import evaluate_model
    from seld_tpu.models.registry import ACCDOA_MODELS
    from seld_tpu.train.checkpoint import load_checkpoint_config

    log = get_logger()
    # The checkpoint-embedded config is what evaluate_model will
    # actually run (it wins over the caller's cfg everywhere) — the
    # knob family and the stamped model_type/feature_set must follow
    # it, or the written calibration could be rejected by its own
    # --calibration replay against this very checkpoint.
    stored = load_checkpoint_config(checkpoint_dir)
    eff_cfg = stored if stored is not None else cfg
    accdoa_mode = eff_cfg.model.model_type in ACCDOA_MODELS
    if accdoa_mode:
        if bias_grid is not None:
            raise ValueError(
                "bias_grid applies to grid models only — ACCDOA families "
                "calibrate the activity threshold (threshold_grid)"
            )
        knob = "accdoa_threshold"
        grid_vals = [float(t) for t in (threshold_grid
                                        or DEFAULT_THRESHOLD_GRID)]
        sweep_kw = {"accdoa_threshold_sweep": grid_vals}
    else:
        if threshold_grid is not None:
            raise ValueError(
                "threshold_grid applies to ACCDOA families only — grid "
                "models calibrate the background bias (bias_grid)"
            )
        knob = "bg_bias"
        grid_vals = [float(b) for b in (bias_grid or DEFAULT_BIAS_GRID)]
        sweep_kw = {"bg_bias_sweep": grid_vals}
    widths = [int(w) for w in (median_widths or DEFAULT_MEDIAN_WIDTHS)]

    common = dict(
        num_visualizations=0,
        save_visualizations=False,
        tta_transforms=tta_transforms,
        int8=int8,
        int8_weight_only=int8_weight_only,
        use_checkpoint=use_checkpoint,
    )
    log.info(
        "Calibration pass 1/2: %s sweep over %s (tta=%s int8=%s)",
        knob, grid_vals, tta_transforms is not None, int8,
    )
    r1 = evaluate_model(cfg, val_corpus, checkpoint_dir, **sweep_kw,
                        **common)
    sweep_report = r1[f"{knob}_sweep"]
    best_knob = float(sweep_report["best"][knob])

    log.info(
        "Calibration pass 2/2: median-width sweep over %s at %s=%g",
        widths, knob, best_knob,
    )
    r2 = evaluate_model(cfg, val_corpus, checkpoint_dir,
                        **{knob: best_knob},
                        median_filter_sweep=widths, **common)
    mf_report = r2["median_filter_sweep"]
    best_w = int(mf_report["best"]["median_filter"])
    final = {k: float(mf_report["metrics"][str(best_w)][k])
             for k in _METRIC_KEYS}

    calib = {
        "calibration_version": CALIBRATION_VERSION,
        "model_type": eff_cfg.model.model_type,
        "feature_set": eff_cfg.features.feature_set,
        "checkpoint": str(checkpoint_dir),
        "use_checkpoint": use_checkpoint,
        "tta": tta_transforms is not None,
        "tta_transforms": (None if tta_transforms is None
                           else [int(t) for t in tta_transforms]),
        "int8": bool(int8),
        "int8_weight_only": bool(int8_weight_only),
        knob: best_knob,
        "median_filter": best_w,
        "val_metrics": final,
        # Audit trail: the full per-candidate tables from both passes.
        "knob_sweep": {"knob": knob, **sweep_report},
        "median_sweep": mf_report,
    }
    log.info(
        "Calibrated decode: %s=%g median_filter=%d -> val SELD_error "
        "%.4f (ER %.3f F %.3f LE %.1f deg LR %.3f)",
        knob, best_knob, best_w, final["SELD_error"], final["ER"],
        final["F_macro"], final["LE_macro"], final["LR_macro"],
    )
    return calib


def write_calibration(calib: dict, out_path) -> Path:
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(calib, indent=2))
    get_logger().info("Calibration written: %s", out_path)
    return out_path


def load_calibration(path) -> dict:
    """Load + sanity-check a decode_calibration.json."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"calibration file not found: {path}")
    calib = json.loads(path.read_text())
    version = calib.get("calibration_version")
    if version != CALIBRATION_VERSION:
        raise ValueError(
            f"{path}: calibration_version {version!r} not supported "
            f"(expected {CALIBRATION_VERSION})"
        )
    for key in ("model_type", "median_filter"):
        if key not in calib:
            raise ValueError(f"{path}: missing calibration key {key!r}")
    if ("bg_bias" in calib) == ("accdoa_threshold" in calib):
        raise ValueError(
            f"{path}: calibration must carry exactly one operating-point "
            "knob (bg_bias for grid models, accdoa_threshold for ACCDOA)"
        )
    return calib


def check_calibration_matches(calib: dict, cfg: Config) -> None:
    """Hard error on a calibration trained for a different model — the
    knobs are model- and feature-specific operating points."""
    if calib["model_type"] != cfg.model.model_type:
        raise ValueError(
            f"calibration was made for model_type="
            f"{calib['model_type']!r} but the config selects "
            f"{cfg.model.model_type!r} — recalibrate"
        )
    feat = calib.get("feature_set")
    if feat is not None and feat != cfg.features.feature_set:
        raise ValueError(
            f"calibration was made for feature_set={feat!r} but the "
            f"config selects {cfg.features.feature_set!r} — recalibrate"
        )
