"""Command-line entry point.

The reference's entry is `python main.py` with NO flags — behavior changes
require editing config.py (ref main.py:20-141, SURVEY §5). seld_tpu gives
the same pipeline a real CLI:

  python -m seld_tpu.cli train  [--synthetic] [--resume] [k.e.y=value ...]
  python -m seld_tpu.cli eval   [--synthetic] [k.e.y=value ...]
  python -m seld_tpu.cli verify                       # shape contracts
  python -m seld_tpu.cli info                         # devices/config

Every config knob is overridable as dotted key=value (e.g.
model.model_type=crnn loss.loss_type=ce train.batch_size=8).
"""

from __future__ import annotations

import argparse
import json
import sys

from seld_tpu.config import Config, parse_overrides
from seld_tpu.utils import describe_devices, setup_logging


def _normalize_config(cfg: Config, logger) -> Config:
    """Cross-field conveniences: ACCDOA models need ACCDOA targets."""
    from seld_tpu.models.registry import ACCDOA_MODELS, MULTI_ACCDOA_MODELS

    if cfg.model.model_type in ACCDOA_MODELS and not cfg.targets.accdoa:
        logger.info("model %s: enabling targets.accdoa", cfg.model.model_type)
        cfg = cfg.replace_path("targets.accdoa", True)
    if cfg.model.model_type in MULTI_ACCDOA_MODELS and cfg.targets.accdoa_tracks == 1:
        logger.info("model %s: setting targets.accdoa_tracks=3",
                    cfg.model.model_type)
        cfg = cfg.replace_path("targets.accdoa_tracks", 3)
    return cfg


def _build_corpora(cfg: Config, synthetic: bool, logger):
    if synthetic:
        logger.info("Using synthetic data (no STARSS22 corpus required)")
        from seld_tpu.data import synthetic_corpus

        train_c = synthetic_corpus(cfg, n_files=2, seconds=30.0, seed=0, train=True)
        test_c = synthetic_corpus(cfg, n_files=1, seconds=20.0, seed=1, train=False)
        return train_c, test_c

    from seld_tpu.data import discover_files
    from seld_tpu.data.cache import cached_build_corpus

    tr_a, tr_m, te_a, te_m = discover_files(cfg.data)
    logger.info("Discovered %d train / %d test files", len(tr_a), len(te_a))
    train_c = cached_build_corpus(
        tr_a, tr_m, cfg.features, cfg.grid, cfg.window, cfg.targets,
        train=True, cache_dir=cfg.data.cache_dir,
    )
    test_c = cached_build_corpus(
        te_a, te_m, cfg.features, cfg.grid, cfg.window, cfg.targets,
        train=False, cache_dir=cfg.data.cache_dir,
    )
    return train_c, test_c


def _make_mesh_if_multidevice(cfg: Config, logger):
    import jax

    if cfg.mesh.enable == "off" or jax.device_count() <= 1:
        return None
    if cfg.mesh.enable == "auto" and jax.default_backend() == "cpu":
        # Virtual CPU devices emulate sharding for tests/dryruns; the
        # single-host thread pool can starve long-program collective
        # rendezvous, so auto mode stays single-device on CPU.
        logger.info("mesh.enable=auto on CPU backend: staying single-device")
        return None
    from seld_tpu.parallel import make_mesh

    n_model = max(1, cfg.mesh.model_axis)
    mesh = make_mesh(n_data=cfg.mesh.data_axis, n_model=n_model)
    logger.info("Mesh: %s over axes %s", mesh.devices.shape, mesh.axis_names)
    return mesh


def cmd_train(cfg: Config, args, logger):
    from seld_tpu.train import train_model

    cfg = _normalize_config(cfg, logger)
    train_c, test_c = _build_corpora(cfg, args.synthetic, logger)
    mesh = _make_mesh_if_multidevice(cfg, logger)
    state, history = train_model(
        cfg, train_c, test_c, mesh=mesh,
        workdir=cfg.data.checkpoint_path, resume=args.resume,
    )
    logger.info(
        "Done: best train %.6f (epoch %d), best test %.6f",
        history["best_train_loss"], history["best_epoch"],
        history["best_test_loss"],
    )
    if args.eval_after:
        return cmd_eval(cfg, args, logger)
    return 0


def _parse_tta_transforms(spec: str | None):
    """CSV transform subset for --tta-transforms; None = all 16."""
    if not spec:
        return None
    return tuple(int(t) for t in spec.split(",") if t.strip())


def _apply_calibration(cfg: Config, args, logger):
    """Fill decode-knob flags from a `seld_tpu calibrate` file.

    Explicit CLI flags win over calibrated values (a passed --bg-bias /
    --accdoa-threshold / --median-filter overrides the file); bool
    levers (tta, int8) are turned ON if the calibration was tuned under
    them, because the scalar knobs are only valid on the decode path
    they were swept on (per-path optima differ — see seld_tpu/
    calibrate.py)."""
    path = getattr(args, "calibration", None)
    if not path:
        return
    from seld_tpu.calibrate import check_calibration_matches, load_calibration

    if getattr(args, "artifact", None):
        raise ValueError(
            "--calibration does not compose with --artifact: export with "
            "--calibration instead — the artifact then carries the tuned "
            "decode"
        )
    calib = load_calibration(path)
    # Check against the config the command will actually run: the
    # checkpoint-embedded config wins everywhere (SELDPredictor /
    # evaluate_model both prefer it), so resolve it the same way here.
    from seld_tpu.train.checkpoint import load_checkpoint_config

    stored = load_checkpoint_config(cfg.data.checkpoint_path)
    check_calibration_matches(calib, stored if stored is not None else cfg)
    # "unset" is None (the consumers' flag defaults), so an explicit
    # `--bg-bias 0` / `--median-filter 0` still overrides the file
    applied = []
    if "bg_bias" in calib and getattr(args, "bg_bias", 0.0) is None:
        args.bg_bias = float(calib["bg_bias"])
        applied.append(f"bg_bias={args.bg_bias:g}")
    if ("accdoa_threshold" in calib
            and getattr(args, "accdoa_threshold", 0.0) is None):
        args.accdoa_threshold = float(calib["accdoa_threshold"])
        applied.append(f"accdoa_threshold={args.accdoa_threshold:g}")
    if getattr(args, "median_filter", 0) is None:
        args.median_filter = int(calib["median_filter"])
        applied.append(f"median_filter={args.median_filter}")
    if calib.get("tta") and not (getattr(args, "tta", False)
                                 or getattr(args, "tta_transforms", None)):
        sel = calib.get("tta_transforms")
        if not hasattr(args, "tta"):
            raise ValueError(
                "this calibration was tuned under TTA, which this "
                "command cannot apply — recalibrate without --tta, or "
                "use predict/eval --calibration"
            )
        args.tta = True
        if sel:
            args.tta_transforms = ",".join(str(t) for t in sel)
        applied.append("tta=on")
    if calib.get("int8"):
        if hasattr(args, "int8") and not args.int8:
            args.int8 = True
            applied.append("int8=on")
        elif hasattr(args, "int8_calib_wavs") and not args.int8_calib_wavs:
            # export: int8 weights need a calibration pass over audio
            raise ValueError(
                "this calibration was tuned under int8 — pass "
                "--int8-calib-wavs so export can bake the quantized "
                "forward"
            )
        if calib.get("int8_weight_only"):
            if not hasattr(args, "int8_weight_only"):
                raise ValueError(
                    "this calibration was tuned under int8 weight-only "
                    "quantization, which this command cannot apply"
                )
            if not args.int8_weight_only:
                args.int8_weight_only = True
                applied.append("int8_weight_only=on")
    logger.info("Applied calibration %s: %s", path,
                ", ".join(applied) if applied else "(no unset knobs)")


def cmd_eval(cfg: Config, args, logger):
    from seld_tpu.eval import evaluate_model

    cfg = _normalize_config(cfg, logger)
    _apply_calibration(cfg, args, logger)
    _, test_c = _build_corpora(cfg, args.synthetic, logger)
    tta = None
    if getattr(args, "tta", False) or getattr(args, "tta_transforms", None):
        from seld_tpu.tta import validate_transforms

        tta = validate_transforms(
            _parse_tta_transforms(getattr(args, "tta_transforms", None))
        )
    # getattr: `train --eval-after` re-enters here with the train
    # parser's namespace, which has no eval-only flags
    int8 = getattr(args, "int8", False)
    int8_wo = getattr(args, "int8_weight_only", False)
    if int8_wo and not int8:
        raise ValueError("--int8-weight-only requires --int8")
    results = evaluate_model(
        cfg, test_c, cfg.data.checkpoint_path,
        num_visualizations=getattr(args, "num_visualizations", 5),
        tta_transforms=tta,
        int8=int8,
        int8_weight_only=int8_wo,
        bg_bias=getattr(args, "bg_bias", None) or 0.0,
        bg_bias_sweep=(
            [float(b) for b in str(sweep_spec).split(",") if b.strip()]
            if (sweep_spec := getattr(args, "bg_bias_sweep", None))
            else None
        ),
        accdoa_threshold=getattr(args, "accdoa_threshold", None),
        accdoa_threshold_sweep=(
            [float(t) for t in str(thr_spec).split(",") if t.strip()]
            if (thr_spec := getattr(args, "accdoa_threshold_sweep", None))
            else None
        ),
        median_filter=getattr(args, "median_filter", None) or 0,
        median_filter_sweep=(
            [int(w) for w in str(mf_spec).split(",") if w.strip()]
            if (mf_spec := getattr(args, "median_filter_sweep", None))
            else None
        ),
        use_checkpoint=getattr(args, "use_checkpoint", "best"),
    )
    printable = {k: v for k, v in results.items() if k != "visualizations"}
    print(json.dumps(printable, indent=2, default=str))
    return 0


def cmd_calibrate(cfg: Config, args, logger):
    """Tune every decode knob on a validation corpus and write a
    calibration file that predict/eval/export consume via
    --calibration. Point the data paths at a VALIDATION split —
    calibrating on the test set invalidates the evaluation."""
    from pathlib import Path

    from seld_tpu.calibrate import run_calibration, write_calibration

    cfg = _normalize_config(cfg, logger)
    _, val_c = _build_corpora(cfg, args.synthetic, logger)
    tta = None
    if args.tta or args.tta_transforms:
        from seld_tpu.tta import validate_transforms

        tta = validate_transforms(_parse_tta_transforms(args.tta_transforms))
    if args.int8_weight_only and not args.int8:
        raise ValueError("--int8-weight-only requires --int8")

    def _floats(spec):
        return ([float(v) for v in str(spec).split(",") if v.strip()]
                if spec else None)

    calib = run_calibration(
        cfg, val_c, cfg.data.checkpoint_path,
        tta_transforms=tta,
        int8=args.int8,
        int8_weight_only=args.int8_weight_only,
        bias_grid=_floats(args.bg_bias_sweep),
        threshold_grid=_floats(args.accdoa_threshold_sweep),
        median_widths=(
            [int(w) for w in str(args.median_widths).split(",") if w.strip()]
            if args.median_widths else None
        ),
        use_checkpoint=args.use_checkpoint,
    )
    out = Path(args.out) if args.out else (
        Path(cfg.data.checkpoint_path) / "decode_calibration.json"
    )
    write_calibration(calib, out)
    printable = {k: v for k, v in calib.items()
                 if k not in ("knob_sweep", "median_sweep")}
    print(json.dumps(printable, indent=2))
    return 0


def cmd_score(cfg: Config, args, logger):
    """Official DCASE2022 scoring of prediction CSVs against ground-truth
    CSVs (the DCASE submission workflow; no model or audio needed)."""
    from seld_tpu.eval.score import match_csv_dirs, score_csv_pairs

    pairs = match_csv_dirs(args.pred_dir, args.gt_dir)
    logger.info("Scoring %d CSV pair(s)", len(pairs))
    result = score_csv_pairs(pairs, cfg, macro_over=args.macro_over)
    logger.info(
        "DCASE2022 (official): ER %.3f F %.3f LE_CD %.1f deg LR_CD %.3f | "
        "SELD_error %.3f (%d files, Nref %d)",
        result["ER"], result["F_macro"], result["LE_macro"],
        result["LR_macro"], result["SELD_error"], result["n_files"],
        result["Nref"],
    )
    print(json.dumps(result, indent=2))
    return 0


def cmd_verify(cfg: Config, args, logger):
    """Shape-contract verifier (the reference's verify_dims.py:10-114)."""
    import jax
    import jax.numpy as jnp

    from seld_tpu.config import ModelConfig
    from seld_tpu.models import build_model, init_variables

    b, t = 2, args.frames
    x = jnp.zeros((b, t, cfg.model.n_channels, cfg.model.n_mels), jnp.float32)
    failures = 0
    for model_type in (
        "cnn", "crnn", "conformer", "resnet_conformer", "accdoa_conformer",
        "multi_accdoa_conformer",
    ):
        if model_type == "multi_accdoa_conformer":
            expect = (b, t, 3, cfg.grid.num_classes - 1, 3)
        elif "accdoa" in model_type:
            expect = (b, t, cfg.grid.num_classes - 1, 3)
        else:  # grid models: class-major (B, T, M, G)
            expect = (b, t, cfg.grid.num_classes, cfg.grid.n_cells)
        mcfg = ModelConfig(model_type=model_type, compute_dtype="float32")
        model = build_model(mcfg, cfg.grid)
        variables = init_variables(model, jax.random.PRNGKey(0), x)
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
        n_params = sum(
            int(p.size) for p in jax.tree_util.tree_leaves(variables["params"])
        )
        ok = out.shape == expect and bool(jnp.isfinite(out).all())
        failures += not ok
        print(
            f"{model_type:>18}: {x.shape} -> {out.shape} "
            f"{'OK' if ok else 'FAIL'} | {n_params:,} params"
        )
    return 1 if failures else 0


def cmd_predict(cfg: Config, args, logger):
    """Serve: WAV file(s) -> STARSS22-style event CSV per clip."""
    from pathlib import Path

    from seld_tpu.infer import SELDPredictor

    _apply_calibration(cfg, args, logger)
    if args.artifact:
        if args.int8:
            raise ValueError(
                "--int8 does not compose with --artifact: int8 is baked "
                "at export time (export --int8-calib-wavs)"
            )
        if args.bg_bias:
            raise ValueError(
                "--bg-bias does not compose with --artifact: the bias is "
                "baked at export time (export --bg-bias)"
            )
        if args.accdoa_threshold is not None:
            raise ValueError(
                "--accdoa-threshold does not compose with --artifact: "
                "the threshold is baked at export time "
                "(export --accdoa-threshold)"
            )
        predictor = SELDPredictor.from_artifact(args.artifact)
        if args.median_filter is not None:
            from seld_tpu.postprocess import validate_width

            # host-side post-op — composes with artifacts (unlike the
            # baked-in bias/int8); an explicit 0 OVERRIDES a
            # sidecar-baked width (the flag default is None, so only a
            # user-passed value reaches here)
            predictor.median_filter = validate_width(args.median_filter)
    else:
        predictor = SELDPredictor(cfg.data.checkpoint_path, cfg,
                                  bg_bias=args.bg_bias or 0.0,
                                  median_filter=args.median_filter or 0,
                                  accdoa_threshold=args.accdoa_threshold)
    if args.int8:
        # self-calibration on the inputs being served: PTQ activation
        # scales from the first clip(s), then int8 inference throughout
        from seld_tpu.data.audio import load_wav

        calib = [load_wav(w)[0] for w in args.wavs[: max(1, args.int8_calib)]]
        predictor.quantize(calib_waves=calib)
    if args.tta or args.tta_transforms:
        predictor.tta(_parse_tta_transforms(args.tta_transforms),
                      fold=getattr(args, "tta_fold", 1))
    out_dir = Path(args.out or cfg.data.output_path) / "predictions"
    for wav in args.wavs:
        csv_out = out_dir / f"{Path(wav).stem}.csv"
        pred = predictor.predict_file(
            wav, csv_out=csv_out, overlap=args.overlap, stream=args.stream
        )
        n_events = len(pred.events())
        logger.info("%s: %d frames, %d active cells -> %s",
                    wav, pred.classes.shape[0], n_events, csv_out)
    return 0


def cmd_export(cfg: Config, args, logger):
    """AOT serving export: checkpoint -> self-contained StableHLO file."""
    from seld_tpu.export import export_serving

    _apply_calibration(cfg, args, logger)
    platforms = None
    if args.platforms:
        platforms = tuple(
            p.strip() for p in args.platforms.split(",") if p.strip()
        ) or None
    if args.int8_weight_only and not args.int8_calib_wavs:
        raise ValueError(
            "--int8-weight-only requires --int8-calib-wavs (the "
            "calibration pass discovers the quantizable layers)"
        )
    calib_waves = None
    if args.int8_calib_wavs:
        from seld_tpu.data.audio import load_wav

        calib_waves = [load_wav(w)[0] for w in args.int8_calib_wavs]
    out = export_serving(
        cfg.data.checkpoint_path, args.out,
        batch_windows=args.batch_windows, platforms=platforms, cfg=cfg,
        int8_calib_waves=calib_waves,
        int8_weight_only=args.int8_weight_only,
        bg_bias=args.bg_bias or 0.0,
        median_filter=args.median_filter or 0,
        accdoa_threshold=args.accdoa_threshold,
    )
    logger.info("Serving artifact written: %s", out)
    return 0


def cmd_import_torch(cfg: Config, args, logger):
    """Migrate a reference PyTorch checkpoint (trainer.py:278-285 format,
    or a bare state_dict .pth) into a seld_tpu checkpoint usable by
    eval/predict."""
    import sys as _sys
    import types

    import jax.numpy as jnp
    import numpy as np
    import torch

    def _load(path):
        try:
            return torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # Reference checkpoints pickle their Config instance; satisfy
            # the unpickler with a permissive stand-in module.
            shim = types.ModuleType("config")

            class _AnyConfig:  # noqa: D401
                def __setstate__(self, state):
                    self.__dict__.update(state if isinstance(state, dict) else {})

            shim.Config = _AnyConfig
            _sys.modules.setdefault("config", shim)
            return torch.load(path, map_location="cpu", weights_only=False)

    ckpt = _load(args.torch_checkpoint)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items() if hasattr(v, "shape") or hasattr(v, "numpy")}

    from seld_tpu.features.spatial import feature_channels
    from seld_tpu.models import build_model
    from seld_tpu.tools.torch_import import convert_torch_state_dict
    from seld_tpu.train.checkpoint import CheckpointManager
    from seld_tpu.train.optimizer import make_optimizer
    from seld_tpu.train.state import TrainState

    kwargs = {}
    if cfg.model.model_type not in ("cnn", "cspdarknet"):
        kwargs["num_classes"] = cfg.grid.num_classes  # grid-head permute
    variables = convert_torch_state_dict(sd, cfg.model.model_type, **kwargs)
    model = build_model(cfg.model, cfg.grid)
    # sanity forward at the production shape
    n_ch = feature_channels(cfg.features.feature_set, cfg.model.n_channels)
    x = jnp.zeros((1, 8, n_ch, cfg.model.n_mels), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 8, cfg.grid.num_classes, cfg.grid.n_cells)

    optimizer = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
    )
    mgr = CheckpointManager(cfg.data.checkpoint_path, cfg)
    epoch = int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0
    test_loss = float(ckpt.get("test_loss", float("inf"))) if isinstance(ckpt, dict) else float("inf")
    mgr.save_best(max(epoch, 1), state, float("nan"), test_loss)
    mgr.wait()
    mgr.close()
    logger.info(
        "Imported %s (%s) -> %s", args.torch_checkpoint,
        cfg.model.model_type, cfg.data.checkpoint_path,
    )
    return 0


def cmd_serve(cfg: Config, args, logger):
    """Long-lived streaming inference server (see seld_tpu/serve.py for
    the wire protocol)."""
    from seld_tpu.infer import SELDPredictor
    from seld_tpu.serve import SELDServer

    if args.artifact:
        if args.int8_calib_wavs:
            raise ValueError(
                "--int8-calib-wavs does not compose with --artifact: "
                "int8 is baked at export time (export --int8-calib-wavs)"
            )
        if args.bg_bias:
            raise ValueError(
                "--bg-bias does not compose with --artifact: the bias is "
                "baked at export time (export --bg-bias)"
            )
        if args.accdoa_threshold is not None:
            raise ValueError(
                "--accdoa-threshold does not compose with --artifact: "
                "the threshold is baked at export time "
                "(export --accdoa-threshold)"
            )
        predictor = SELDPredictor.from_artifact(args.artifact)
    else:
        predictor = SELDPredictor(cfg.data.checkpoint_path, cfg,
                                  bg_bias=args.bg_bias,
                                  accdoa_threshold=args.accdoa_threshold)
    if args.int8_calib_wavs:
        from seld_tpu.data.audio import load_wav

        predictor.quantize(
            calib_waves=[load_wav(w)[0] for w in args.int8_calib_wavs]
        )
    server = SELDServer(predictor, host=args.host, port=args.port,
                        max_streams=args.max_streams,
                        batch_streams=args.batch_streams,
                        batch_wait_s=args.batch_wait_ms / 1000.0)
    logger.info(
        "Serving %s on %s:%d (%s%s) — Ctrl-C to stop",
        predictor.cfg.model.model_type, args.host, server.port,
        "int8" if predictor.quantized else "float",
        ", cross-stream batching" if args.batch_streams else "",
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("serve: interrupted, shutting down")
    finally:
        server.server_close()
    return 0


def cmd_migrate_ckpt(cfg: Config, args, logger):
    from seld_tpu.tools.migrate_ckpt import migrate_checkpoint_tree

    summary = migrate_checkpoint_tree(args.checkpoint_dir, args.output_dir)
    for sub, entries in summary.items():
        for step, n in entries:
            logger.info("migrated %s step %d (%d leaves permuted)", sub, step, n)
    logger.info("migrated checkpoints written to %s", args.output_dir)
    return 0


def cmd_average_ckpts(cfg: Config, args, logger):
    from seld_tpu.tools.average_ckpt import average_checkpoints

    steps = None
    if args.steps:
        steps = [int(s) for s in args.steps.split(",") if s.strip()]
    summary = average_checkpoints(
        args.checkpoint_dir, args.output_dir, last=args.last, steps=steps
    )
    logger.info(
        "SWA checkpoint written: %s (averaged epochs %s, %s params)",
        args.output_dir, summary["steps"], f"{summary['n_params']:,}",
    )
    return 0


def cmd_info(cfg: Config, args, logger):
    from seld_tpu.config import config_to_dict

    info = describe_devices(logger)
    print(json.dumps({"devices": info, "config": config_to_dict(cfg)}, indent=2))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="seld_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("overrides", nargs="*", help="config overrides k.e.y=value")
    common.add_argument("--synthetic", action="store_true",
                        help="use synthetic data instead of STARSS22 on disk")

    p_train = sub.add_parser("train", parents=[common])
    p_train.add_argument("--resume", action="store_true")
    p_train.add_argument("--eval-after", action="store_true")
    p_train.add_argument("--num-visualizations", type=int, default=5)
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("eval", parents=[common])
    p_eval.add_argument("--num-visualizations", type=int, default=5)
    p_eval.add_argument(
        "--use-checkpoint", choices=("best", "latest"), default="best",
        dest="use_checkpoint",
        help="which checkpoint to score: 'best' (default — the "
        "test-loss/metric-selected serving artifact, EMA weights if the "
        "run used train.ema_decay) or 'latest' (newest rolling "
        "checkpoint, raw weights — late-training diagnostics)",
    )
    p_eval.add_argument(
        "--tta", action="store_true",
        help="ACS test-time augmentation: metrics computed on predictions "
        "averaged over the 16 label-exact FOA scene transforms (16x "
        "compute; requires features.feature_set=mel_iv; losses stay on "
        "the plain forward for comparability)",
    )
    p_eval.add_argument(
        "--tta-transforms", default=None,
        help="comma-separated transform subset for --tta (e.g. '0,1,2,3' "
        "= the four azimuth rotations); default all 16",
    )
    p_eval.add_argument(
        "--int8", action="store_true",
        help="evaluate the int8 post-training-quantized forward "
        "(self-calibrated on the first eval batches) — the accuracy "
        "gate for int8 serving/export on your own labeled data",
    )
    p_eval.add_argument(
        "--bg-bias", type=float, default=None, metavar="B",
        help="background-logit decode bias for grid models: the background class's logit is reduced by B before every decode (tune on validation data with eval --bg-bias-sweep); an explicit 0 overrides a --calibration value",
    )
    p_eval.add_argument(
        "--bg-bias-sweep", default=None, metavar="B1,B2,...",
        help="calibrate --bg-bias: ONE forward per batch, every listed "
        "bias decoded on device, per-bias DCASE2022 table + the "
        "SELD_error-best bias in the report",
    )
    p_eval.add_argument(
        "--int8-weight-only", action="store_true",
        help="with --int8: quantize weights only (original-precision "
        "compute — the export --int8-weight-only numerics)",
    )
    p_eval.add_argument(
        "--accdoa-threshold", type=float, default=None, metavar="T",
        help="vector-norm activity threshold for ACCDOA / multi-ACCDOA "
        "decodes (default 0.5) — the ACCDOA counterpart of --bg-bias's "
        "operating point",
    )
    p_eval.add_argument(
        "--accdoa-threshold-sweep", default=None, metavar="T1,T2,...",
        help="calibrate --accdoa-threshold: ONE forward per batch (per "
        "view under --tta), every listed threshold decoded on device, "
        "per-threshold DCASE2022 table + the SELD_error-best threshold "
        "in the report",
    )
    p_eval.add_argument(
        "--median-filter", type=int, default=None, metavar="W",
        help="temporal majority smoothing of decoded prediction grids "
        "over an odd W-frame window before metrics (the eval gate for "
        "predict --median-filter; composes with --tta/--int8/--bg-bias)",
    )
    p_eval.add_argument(
        "--median-filter-sweep", default=None, metavar="W1,W2,...",
        help="calibrate --median-filter: the filter runs host-side on "
        "already-decoded grids, so every listed width is scored from "
        "ONE eval pass — per-width DCASE2022 table + best width in the "
        "report",
    )
    p_eval.add_argument(
        "--calibration", default=None, metavar="FILE",
        help="apply a `seld_tpu calibrate` file: fills --bg-bias/"
        "--accdoa-threshold/--median-filter (and re-enables the "
        "tta/int8 path the calibration was tuned on); explicit flags "
        "override the file",
    )
    p_eval.set_defaults(fn=cmd_eval)

    p_verify = sub.add_parser("verify", parents=[common])
    p_verify.add_argument("--frames", type=int, default=250)
    p_verify.set_defaults(fn=cmd_verify)

    p_pred = sub.add_parser("predict", parents=[common])
    p_pred.add_argument("--wavs", nargs="+", required=True)
    p_pred.add_argument(
        "--stream", action="store_true",
        help="bounded-memory streaming inference (1 s chunks)",
    )
    p_pred.add_argument(
        "--overlap", type=float, default=0.0,
        help="window overlap in [0,1): average the per-frame "
        "representation over overlapping windows before decoding "
        "(grid: class probabilities; ACCDOA: vectors; multi-ACCDOA: "
        "class-activity votes) — smoother boundaries, 1/(1-overlap)x "
        "compute; composes with --stream)",
    )
    p_pred.add_argument(
        "--int8", action="store_true",
        help="int8 post-training-quantized inference (v5e MXU int8 "
        "path); activation scales self-calibrate on the input clips",
    )
    p_pred.add_argument(
        "--int8-calib", type=int, default=1,
        help="number of input clips used for int8 calibration",
    )
    p_pred.add_argument(
        "--tta", action="store_true",
        help="ACS test-time augmentation: average predictions over the 16 "
        "label-exact FOA scene transforms (16x compute; requires "
        "features.feature_set=mel_iv; composes with --stream/--overlap/"
        "--int8, not with --artifact)",
    )
    p_pred.add_argument(
        "--tta-transforms", default=None,
        help="comma-separated transform subset for TTA (e.g. '0,1,2,3' = "
        "the four azimuth rotations); implies --tta",
    )
    p_pred.add_argument(
        "--tta-fold", type=int, default=1,
        help="TTA views folded into each device call's window batch "
        "(must divide the transform count): amortizes the per-view scan "
        "overhead while fold*batch stays in the flat b8-24 VMEM regime; "
        "results at different folds agree to ~1e-6 (stream==offline "
        "bit-equality holds at a fixed fold)",
    )
    p_pred.add_argument("--out", default=None)
    p_pred.add_argument(
        "--artifact", default=None,
        help="serve from an exported StableHLO artifact instead of a "
        "checkpoint (no model code / weight restore; int8 is baked at "
        "export time, so --int8 is rejected here)",
    )
    p_pred.add_argument(
        "--bg-bias", type=float, default=None, metavar="B",
        help="background-logit decode bias for grid models: the background class's logit is reduced by B before every decode (tune on validation data with eval --bg-bias-sweep); an explicit 0 overrides a --calibration value",
    )
    p_pred.add_argument(
        "--accdoa-threshold", type=float, default=None, metavar="T",
        help="vector-norm activity threshold for ACCDOA / multi-ACCDOA "
        "decodes (default 0.5; tune with eval --accdoa-threshold-sweep)",
    )
    p_pred.add_argument(
        "--median-filter", type=int, default=None, metavar="W",
        help="temporal majority smoothing of the decoded class grid over "
        "an odd W-frame window (tune with eval --median-filter-sweep; "
        "applies to assembled predictions, so --stream output stays "
        "bit-equal to offline; composes with --artifact, where an "
        "explicit 0 disables a sidecar-baked width)",
    )
    p_pred.add_argument(
        "--calibration", default=None, metavar="FILE",
        help="apply a `seld_tpu calibrate` file: fills --bg-bias/"
        "--accdoa-threshold/--median-filter (and re-enables the "
        "tta/int8 path the calibration was tuned on); explicit flags "
        "override the file; not with --artifact (export with "
        "--calibration instead)",
    )
    p_pred.set_defaults(fn=cmd_predict)

    p_imp = sub.add_parser("import-torch", parents=[common])
    p_imp.add_argument("--torch-checkpoint", required=True,
                       help=".pth from the reference pipeline")
    p_imp.set_defaults(fn=cmd_import_torch)

    p_exp = sub.add_parser("export", parents=[common])
    p_exp.add_argument("--out", required=True,
                       help="output path for the StableHLO artifact")
    p_exp.add_argument("--batch-windows", type=int, default=8)
    p_exp.add_argument("--platforms", default=None,
                       help="comma list, e.g. tpu,cpu (default: current)")
    p_exp.add_argument(
        "--int8-calib-wavs", nargs="+", default=None,
        help="export the int8 PTQ forward instead, calibrated on these "
        "WAVs (int8 weights/scales bake into the artifact)",
    )
    p_exp.add_argument(
        "--int8-weight-only", action="store_true",
        help="with --int8-calib-wavs: quantize weights only (int8 "
        "storage, original-precision compute — smaller artifact at "
        "near-float accuracy, no MXU int8 speedup)",
    )
    p_exp.add_argument(
        "--bg-bias", type=float, default=None, metavar="B",
        help="bake a validation-tuned background decode bias into the "
        "exported forwards (grid models; see eval --bg-bias-sweep)",
    )
    p_exp.add_argument(
        "--median-filter", type=int, default=None, metavar="W",
        help="record a tuned temporal-smoothing width in the artifact "
        "sidecar (host-side post-op; from_artifact applies it "
        "automatically; see eval --median-filter-sweep)",
    )
    p_exp.add_argument(
        "--accdoa-threshold", type=float, default=None, metavar="T",
        help="bake a validation-tuned ACCDOA activity threshold into the "
        "exported forwards (ACCDOA / multi-ACCDOA models; see eval "
        "--accdoa-threshold-sweep)",
    )
    p_exp.add_argument(
        "--calibration", default=None, metavar="FILE",
        help="bake a `seld_tpu calibrate` file's tuned decode into the "
        "artifact (bias/threshold into the forwards, median width into "
        "the sidecar); TTA-path calibrations are rejected (artifacts "
        "serve the plain forward); int8-path calibrations additionally "
        "need --int8-calib-wavs",
    )
    p_exp.set_defaults(fn=cmd_export)

    p_cal = sub.add_parser(
        "calibrate", parents=[common],
        help="tune every decode knob (bias/threshold + median width) on "
             "a validation corpus; writes decode_calibration.json for "
             "predict/eval/export --calibration",
    )
    p_cal.add_argument(
        "--use-checkpoint", choices=("best", "latest"), default="best",
        dest="use_checkpoint",
        help="which checkpoint to calibrate (matches eval --use-checkpoint)",
    )
    p_cal.add_argument(
        "--tta", action="store_true",
        help="calibrate the TTA decode path (per-path optima differ — "
        "the calibration file records the path it was tuned on and "
        "--calibration re-enables it)",
    )
    p_cal.add_argument(
        "--tta-transforms", default=None,
        help="comma-separated transform subset for --tta (default all 16)",
    )
    p_cal.add_argument(
        "--int8", action="store_true",
        help="calibrate the int8 PTQ decode path",
    )
    p_cal.add_argument(
        "--int8-weight-only", action="store_true",
        help="with --int8: weight-only quantization numerics",
    )
    p_cal.add_argument(
        "--bg-bias-sweep", default=None, metavar="B1,B2,...",
        help="candidate background biases for grid models "
        "(default -1,-0.5,0,0.5,1,1.5,2,3)",
    )
    p_cal.add_argument(
        "--accdoa-threshold-sweep", default=None, metavar="T1,T2,...",
        help="candidate activity thresholds for ACCDOA families "
        "(default 0.2,0.3,0.4,0.5,0.6,0.7)",
    )
    p_cal.add_argument(
        "--median-widths", default=None, metavar="W1,W2,...",
        help="candidate median-filter widths (default 1,3,5,7; 1 = off)",
    )
    p_cal.add_argument(
        "--out", default=None,
        help="output path (default <checkpoint_path>/decode_calibration.json)",
    )
    p_cal.set_defaults(fn=cmd_calibrate)

    p_score = sub.add_parser(
        "score", parents=[common],
        help="official DCASE2022 metrics for prediction CSVs vs ground truth",
    )
    p_score.add_argument("--pred-dir", required=True,
                         help="directory of predicted STARSS22-format CSVs")
    p_score.add_argument("--gt-dir", required=True,
                         help="directory of ground-truth CSVs (matched by name)")
    p_score.add_argument("--macro-over", choices=("all", "gt"), default="all",
                         help="macro-average over all classes (official) or "
                              "only classes present in the ground truth")
    p_score.set_defaults(fn=cmd_score)

    p_serve = sub.add_parser(
        "serve", parents=[common],
        help="long-lived TCP streaming inference server (bit-equal to "
             "offline prediction; bounded memory per stream)",
    )
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8771)
    p_serve.add_argument(
        "--int8-calib-wavs", nargs="+", default=None,
        help="serve the int8 PTQ forward, calibrated on these WAVs",
    )
    p_serve.add_argument(
        "--max-streams", type=int, default=0,
        help="exit cleanly after N completed streams (0 = run forever); "
        "the clean-shutdown path for benchmarks and device-attached hosts",
    )
    p_serve.add_argument(
        "--batch-streams", action="store_true",
        help="continuous batching: pack windows from concurrent streams "
        "into shared device calls (outputs stay bit-equal per stream)",
    )
    p_serve.add_argument(
        "--batch-wait-ms", type=float, default=0.0,
        help="with --batch-streams: hold a partial batch open this long "
        "for more streams to join (0 = never delay a ready device)",
    )
    p_serve.add_argument(
        "--artifact", default=None,
        help="serve from an exported StableHLO artifact instead of a "
        "checkpoint (int8 is baked at export time, so "
        "--int8-calib-wavs is rejected here)",
    )
    p_serve.add_argument(
        "--bg-bias", type=float, default=0.0, metavar="B",
        help="background-logit decode bias for grid models: the background class's logit is reduced by B before every decode (tune on validation data with eval --bg-bias-sweep)",
    )
    p_serve.add_argument(
        "--accdoa-threshold", type=float, default=None, metavar="T",
        help="vector-norm activity threshold for ACCDOA / multi-ACCDOA "
        "decodes (default 0.5; tune with eval --accdoa-threshold-sweep)",
    )
    p_serve.set_defaults(fn=cmd_serve)

    p_mig = sub.add_parser(
        "migrate-ckpt", parents=[common],
        help="upgrade pre-round-3 class-minor GridHead checkpoints to the "
             "class-major (B, T, M, G) layout (pure column permutation; "
             "migrated models emit identical values)",
    )
    p_mig.add_argument("--checkpoint-dir", required=True,
                       help="checkpoint tree written before the layout switch")
    p_mig.add_argument("--output-dir", required=True,
                       help="destination for the migrated checkpoint tree")
    p_mig.set_defaults(fn=cmd_migrate_ckpt)

    p_avg = sub.add_parser(
        "average-ckpts", parents=[common],
        help="stochastic weight averaging: average rolling checkpoints "
        "into a fresh best checkpoint (serving artifact)",
    )
    p_avg.add_argument("--checkpoint-dir", required=True,
                       help="source run's checkpoint tree (with rolling/)")
    p_avg.add_argument("--output-dir", required=True,
                       help="destination tree; the average lands in best/")
    p_avg.add_argument("--last", type=int, default=None,
                       help="average the newest N rolling checkpoints "
                       "(default: all retained)")
    p_avg.add_argument("--steps", default=None,
                       help="explicit comma-separated epoch list (wins "
                       "over --last)")
    p_avg.set_defaults(fn=cmd_average_ckpts)

    p_info = sub.add_parser("info", parents=[common])
    p_info.set_defaults(fn=cmd_info)

    args = parser.parse_args(argv)
    logger, log_file = setup_logging(experiment_name=f"seld_tpu_{args.command}")
    logger.info("Log file: %s", log_file)
    try:
        cfg = parse_overrides(Config(), args.overrides)
        return args.fn(cfg, args, logger)
    except Exception:
        logger.exception("%s failed", args.command)
        return 1


if __name__ == "__main__":
    sys.exit(main())
