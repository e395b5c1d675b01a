"""Inference / serving: WAV in -> per-frame grid predictions + event rows.

The reference has no standalone inference path — prediction exists only
inside test_model's evaluation loop (ref trainer.py:394-711). This module
provides the serving story: load a checkpoint once (architecture rebuilt
from the config stored inside it), then stream audio files through a
single jitted program (fused mel front-end -> backbone -> argmax grid)
with fixed-shape window batches, and decode the grid back into
STARSS22-style metadata rows (100 ms frames, class, azimuth, elevation).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.config import Config
from seld_tpu.data.audio import load_wav
from seld_tpu.data.corpus import compute_mel_features
from seld_tpu.grid import cell_centers
from seld_tpu.models import build_model
from seld_tpu.train.checkpoint import CheckpointManager, load_checkpoint_config
from seld_tpu.train.optimizer import make_optimizer
from seld_tpu.train.state import create_train_state
from seld_tpu.utils.logging import get_logger


def bias_background_logits(out, bias):
    """Background decode bias on class-major (B, T, M, G) grid logits:
    reduce the background class's (last) row by `bias`. THE one encoding
    of the op — SELDPredictor._raw_apply and eval's decode path both
    call it, so sign/axis can never desynchronize between served and
    eval-reported operating points."""
    return out.at[:, :, -1, :].add(jnp.asarray(bias, out.dtype) * -1)


def validate_accdoa_threshold(threshold, accdoa_mode: bool) -> float:
    """THE one validation of the ACCDOA activity-threshold knob (the
    predictor, eval, and export all call it): None means the
    DCASE2022-baseline default 0.5; an explicit value requires an ACCDOA
    output family (mirror of bg_bias rejecting ACCDOA models) and must
    be >= 0 (vector norms are non-negative; 0 keeps only exact-zero
    vectors inactive)."""
    if threshold is None:
        return 0.5
    if not accdoa_mode:
        raise ValueError(
            "accdoa_threshold applies to ACCDOA / multi-ACCDOA models "
            "only — grid models tune their operating point with bg_bias"
        )
    threshold = float(threshold)
    if threshold < 0:
        raise ValueError(
            f"accdoa_threshold must be >= 0, got {threshold}"
        )
    return threshold


@dataclass
class Prediction:
    """Per-frame grid predictions for one clip."""

    classes: np.ndarray  # (T, G) int8 argmax class per cell
    n_el: int
    n_az: int
    num_classes: int

    @property
    def background_class(self) -> int:
        return self.num_classes - 1

    def events(self) -> list[tuple[int, int, int, int]]:
        """Active cells as (frame_20ms, class, azimuth_deg, elevation_deg)
        at grid-cell-center resolution."""
        el, az = cell_centers(self.n_el, self.n_az)
        t_idx, cell_idx = np.nonzero(self.classes != self.background_class)
        out = []
        for t, c in zip(t_idx, cell_idx):
            i, j = divmod(int(c), self.n_az)
            out.append(
                (int(t), int(self.classes[t, c]), int(round(az[j])), int(round(el[i])))
            )
        return out

    def to_metadata_rows(self, min_votes: int = 3) -> np.ndarray:
        """Collapse 20 ms frames back to 100 ms STARSS22 metadata rows
        (frame, class, source=0, azimuth, elevation): a (class, cell) is
        emitted for a metadata frame when active in >= min_votes of its 5
        label frames (the inverse of the rasterizer's 5x fanout,
        ref dataset.py:67-70)."""
        t, g = self.classes.shape
        fanout = 5
        n_meta = t // fanout
        el, az = cell_centers(self.n_el, self.n_az)
        rows = []
        cls = self.classes[: n_meta * fanout].reshape(n_meta, fanout, g)
        for mf in range(n_meta):
            block = cls[mf]  # (5, G)
            for c in range(g):
                vals, counts = np.unique(block[:, c], return_counts=True)
                for v, n in zip(vals, counts):
                    if v != self.background_class and n >= min_votes:
                        i, j = divmod(c, self.n_az)
                        rows.append(
                            (mf, int(v), 0, int(round(az[j])), int(round(el[i])))
                        )
        return np.asarray(rows, np.int64).reshape(-1, 5)


class SELDPredictor:
    """Checkpoint-backed predictor with a single compiled forward."""

    def __init__(self, checkpoint_dir, cfg: Config | None = None,
                 batch_windows: int = 8, bg_bias: float = 0.0,
                 median_filter: int = 0,
                 accdoa_threshold: float | None = None):
        """bg_bias: background-logit decode bias (grid models only). The
        background class's logit is reduced by this amount before every
        argmax/softmax — a post-hoc detection operating point, tuned on
        validation data with `eval --bg-bias-sweep` (weighted CE trains
        toward a likelihood whose plain argmax need not be the best
        decision rule; measured -18% SELD_error on the probe corpus,
        benchmarks/results/bg_bias_probe.json). Applies uniformly to
        plain/int8/TTA/streaming forwards.

        median_filter: odd temporal window (frames) for majority
        smoothing of the decoded class grid (seld_tpu.postprocess) —
        applied to COMPLETE assembled predictions (predict_waveform and
        stream_predict filter the same assembled grid, keeping
        offline==stream bit-equality by construction; the serve
        daemon's incremental fragments stay raw). 0 disables.

        accdoa_threshold: vector-norm activity threshold for ACCDOA /
        multi-ACCDOA decodes (None = the DCASE2022-baseline 0.5) — the
        ACCDOA counterpart of bg_bias's detection operating point, tuned
        on validation data with `eval --accdoa-threshold-sweep`. Applies
        uniformly to plain/int8/TTA/streaming/overlap forwards (single
        injection set: the decode calls here, _rep_from_raw's
        multi-ACCDOA vote maps, and _decode_avg's vector decode)."""
        stored = load_checkpoint_config(checkpoint_dir)
        if stored is None and cfg is None:
            raise FileNotFoundError(f"no checkpoint config under {checkpoint_dir}")
        self.cfg = stored if stored is not None else cfg
        self.batch_windows = batch_windows
        self.win = self.cfg.window.window_frames(self.cfg.features)

        from seld_tpu.features.spatial import feature_channels

        self.model = build_model(self.cfg.model, self.cfg.grid)
        optimizer = make_optimizer(self.cfg.train.learning_rate)
        n_feat_ch = feature_channels(
            self.cfg.features.feature_set, self.cfg.model.n_channels
        )
        sample = jnp.zeros(
            (batch_windows, self.win, n_feat_ch, self.cfg.model.n_mels),
            jnp.float32,
        )
        template = create_train_state(
            self.model, optimizer, jax.random.PRNGKey(0), sample
        )
        mgr = CheckpointManager(checkpoint_dir, self.cfg)
        restored = mgr.restore_best(template) or mgr.restore_latest(template)
        mgr.close()
        if restored is None:
            raise FileNotFoundError(f"no checkpoint found under {checkpoint_dir}")
        self.state, self.meta = restored
        get_logger().info(
            "Predictor: %s from epoch %d",
            self.cfg.model.model_type, self.meta["epoch"],
        )

        from seld_tpu.models.registry import ACCDOA_MODELS, MULTI_ACCDOA_MODELS

        self.accdoa_mode = self.cfg.model.model_type in ACCDOA_MODELS
        if self.cfg.model.model_type in MULTI_ACCDOA_MODELS:
            self.kind = "multi_accdoa"
        elif self.accdoa_mode:
            self.kind = "accdoa"
        else:
            self.kind = "grid"
        self.bg_bias = float(bg_bias)
        if self.bg_bias and self.accdoa_mode:
            raise ValueError(
                "bg_bias applies to grid models only — ACCDOA decodes "
                "have no background logit"
            )
        self.accdoa_threshold = validate_accdoa_threshold(
            accdoa_threshold, self.accdoa_mode
        )
        from seld_tpu.postprocess import validate_width

        self.median_filter = validate_width(median_filter)
        grid_cfg = self.cfg.grid

        @jax.jit
        def forward(state, mel):  # (B, win, C, F) -> (B, win, G) int8
            out = self._raw_apply(None, state, mel)
            if self.accdoa_mode:
                from seld_tpu.models.registry import MULTI_ACCDOA_MODELS

                if self.cfg.model.model_type in MULTI_ACCDOA_MODELS:
                    from seld_tpu.accdoa import (
                        decode_multi_accdoa_to_grid_jnp as decode_accdoa_to_grid_jnp,
                    )
                else:
                    from seld_tpu.accdoa import decode_accdoa_to_grid_jnp

                return decode_accdoa_to_grid_jnp(
                    out, grid_cfg.n_el, grid_cfg.n_az, grid_cfg.num_classes,
                    self.accdoa_threshold,
                )
            # class-major grid logits (B, win, M, G)
            return jnp.argmax(out, axis=2).astype(jnp.int8)

        @jax.jit
        def forward_probs(state, mel):  # (B, win, ...) averageable rep, f16
            return self._rep_from_raw(self._raw_apply(None, state, mel))

        self._forward = forward
        self._forward_probs = forward_probs
        self.quantized = False
        self._quant_tree = None
        self._tta_transforms = None
        self._tta_fold = 1
        # Optional cross-stream window dispatcher (seld_tpu.serve.
        # WindowBatcher): when set, _batched routes its rows there so
        # windows from CONCURRENT streams share device calls. Safe under
        # the bit-equality contract because at the fixed batch shape the
        # forward is row-wise content-independent — another stream's
        # window in a padding slot produces the same bits as a zero row.
        self.dispatch = None

    @classmethod
    def from_artifact(cls, artifact_path) -> "SELDPredictor":
        """Artifact-backed predictor: serve an `export_serving` StableHLO
        file with NO checkpoint tree, no Flax model rebuild, and no
        weight restore — the deployment story where only the exported
        artifact ships. Every serving surface works unchanged
        (predict_waveform / predict_file, `--stream` sessions, the TCP
        daemon incl. `--batch-streams`): they consume only cfg / win /
        accdoa_mode / _batched and the two forwards, all reconstructed
        from the artifact + its sidecar (which embeds the full config).
        `quantize()` is unavailable here — int8 is baked at export time
        (`export --int8-calib-wavs`). No reference counterpart (the
        reference's serving artifact is a pickle needing the torch
        classes, ref trainer.py:428-476)."""
        from jax import export as jexport

        from seld_tpu.config import config_from_dict
        from seld_tpu.export import load_serving

        call, sidecar = load_serving(artifact_path)
        if "config" not in sidecar:
            raise ValueError(
                f"{artifact_path}: sidecar has no embedded config "
                "(artifact predates from_artifact support) — re-export "
                "with `seld_tpu export`"
            )
        self = cls.__new__(cls)
        self.cfg = config_from_dict(sidecar["config"])
        self.batch_windows = int(
            sidecar.get("batch_windows") or sidecar["input_shape"][0]
        )
        self.win = int(sidecar["window_frames"])
        self.model = None
        self.state = None
        self.meta = {"epoch": int(sidecar.get("source_epoch", -1))}

        from seld_tpu.models.registry import ACCDOA_MODELS, MULTI_ACCDOA_MODELS

        self.accdoa_mode = sidecar["model_type"] in ACCDOA_MODELS
        if sidecar["model_type"] in MULTI_ACCDOA_MODELS:
            self.kind = "multi_accdoa"
        elif self.accdoa_mode:
            self.kind = "accdoa"
        else:
            self.kind = "grid"
        # decode bias, if any, was baked into the exported forwards
        self.bg_bias = float(sidecar.get("bg_bias", 0.0))
        # threshold: baked into the exported argmax/vote forwards, but
        # the single-ACCDOA .probs representation is raw vectors, so the
        # host-side _decode_avg still needs the value
        self.accdoa_threshold = float(sidecar.get("accdoa_threshold", 0.5))
        # host-side post-op: the sidecar carries the export-time tuned
        # width; predict --median-filter can still override after
        # construction
        from seld_tpu.postprocess import validate_width

        self.median_filter = validate_width(
            sidecar.get("median_filter", 0)
        )
        fwd = jax.jit(call)
        self._forward = lambda state, mel: fwd(mel)
        if sidecar.get("has_probs"):
            probs_path = Path(str(artifact_path) + ".probs")
            exported_probs = jexport.deserialize(probs_path.read_bytes())
            fwd_p = jax.jit(exported_probs.call)
            self._forward_probs = lambda state, mel: fwd_p(mel)
        else:
            def _no_probs(state, mel):
                raise RuntimeError(
                    "this artifact has no representation forward "
                    "(exported before ACCDOA overlap support) — "
                    "re-export, or serve with overlap=0"
                )

            self._forward_probs = _no_probs
        self.quantized = bool(sidecar.get("quantized_int8"))
        self._quant_tree = None
        self._tta_transforms = None
        self._tta_fold = 1
        self.dispatch = None
        get_logger().info(
            "Predictor: %s from artifact %s (epoch %d%s)",
            sidecar["model_type"], artifact_path, self.meta["epoch"],
            ", int8" if self.quantized else "",
        )
        return self

    def _raw_apply(self, qtree, state, mel):
        """Model output (pre-decode) for one feature batch; qtree=None is
        the float path, otherwise the int8-quantized one (qtree rides as
        a jit argument — see quant.apply_maybe_quantized). Grid models
        apply the bg_bias decode bias here — the single injection point
        every forward (plain/int8/TTA, and streaming through them)
        inherits, so the stream==offline bit-equality holds under bias."""
        from seld_tpu.quant import apply_maybe_quantized

        out = apply_maybe_quantized(self.model, state.variables(), qtree, mel)
        if self.bg_bias and not self.accdoa_mode:
            out = bias_background_logits(out, self.bg_bias)
        return out

    def _rep_from_raw(self, out):
        """Raw model output -> the AVERAGEABLE per-frame representation
        overlapped serving accumulates (device side, f16):

          grid:         (B, T, M, G) softmax class probabilities
          accdoa:       (B, T, C_ev, 3) Cartesian vectors (mean vectors
                        shrink toward 0 on disagreement — conservative)
          multi_accdoa: (B, T, C_ev, G) {0, 1} class-activity votes
                        (track order is arbitrary per forward pass; the
                        activity map is not — same representation TTA
                        averages, seld_tpu/tta.py)
        """
        if self.kind == "grid":
            return jax.nn.softmax(out, axis=2).astype(jnp.float16)
        if self.kind == "multi_accdoa":
            from seld_tpu.accdoa import multi_accdoa_class_activity_jnp

            grid_cfg = self.cfg.grid
            return multi_accdoa_class_activity_jnp(
                out, grid_cfg.n_el, grid_cfg.n_az, self.accdoa_threshold
            ).astype(jnp.float16)
        return out.astype(jnp.float16)

    def _decode_avg(self, avg: np.ndarray) -> np.ndarray:
        """Coverage-averaged representation (T, ...) f32 -> (T, G) int8
        class grid. Host-side and shared verbatim by the offline and
        streaming overlap paths (their bit-equality needs one decoder)."""
        grid_cfg = self.cfg.grid
        if self.kind == "grid":
            return np.argmax(avg, axis=1).astype(np.int8)
        if self.kind == "multi_accdoa":
            from seld_tpu.accdoa import decode_vote_grid

            return decode_vote_grid(avg, grid_cfg.num_classes)
        from seld_tpu.accdoa import decode_accdoa_to_grid

        return decode_accdoa_to_grid(
            avg, grid_cfg.n_el, grid_cfg.n_az, grid_cfg.num_classes,
            self.accdoa_threshold,
        )

    def tta(self, transforms=None, fold: int = 1):
        """Enable ACS test-time augmentation (seld_tpu.tta): every window
        is predicted under each of the selected FOA scene transforms
        (default: all 16), each prediction is mapped back to original
        coordinates with the exact inverse transform, and the results are
        averaged — mean softmax probabilities for grid models, mean
        inverse-rotated vectors for single-ACCDOA. Costs len(transforms)x
        compute per window (run as a scan at the native batch shape).
        `fold` packs that many views into each device call's batch
        (seld_tpu.tta fold semantics): worthwhile while
        fold*batch_windows stays in the flat b8-24 VMEM regime; results
        at different folds agree to ~1e-6, and every bit-equality
        contract (stream==offline, int8 composition) holds at a FIXED
        fold.

        Composes with quantize() in either call order and with streaming
        (`--stream` reuses these forwards, so stream==offline bit-equality
        holds under TTA too). Requires feature_set='mel_iv' (same validity
        rule as training-time ACS). Multi-ACCDOA averages in DECODED
        space (per-class cell-activity votes, majority-thresholded —
        seld_tpu.tta kind="multi_accdoa") because its raw track outputs
        are permutation-ambiguous per forward pass."""
        if self.model is None:
            raise ValueError(
                "artifact-backed predictors cannot enable TTA: the "
                "artifact exports only the plain forward — use a "
                "checkpoint-backed predictor"
            )
        from seld_tpu.models.registry import MULTI_ACCDOA_MODELS
        from seld_tpu.tta import make_tta_forward, validate_transforms

        sel = validate_transforms(transforms)
        cfg = self.cfg
        grid_cfg = cfg.grid
        if cfg.model.model_type in MULTI_ACCDOA_MODELS:
            kind = "multi_accdoa"
        elif self.accdoa_mode:
            kind = "accdoa"
        else:
            kind = "grid"
        tta_fwd = make_tta_forward(
            lambda ctx, mel: self._raw_apply(ctx[0], ctx[1], mel),
            grid_cfg.n_el, grid_cfg.n_az, cfg.features.feature_set,
            transforms=sel, kind=kind,
            activity_threshold=self.accdoa_threshold,
            fold=fold,
        )

        @jax.jit
        def forward_tta(qtree, state, mel):  # -> (B, win, G) int8
            avg = tta_fwd((qtree, state), mel)
            if kind == "multi_accdoa":
                from seld_tpu.accdoa import decode_vote_grid_jnp

                return decode_vote_grid_jnp(avg, grid_cfg.num_classes)
            if kind == "accdoa":
                from seld_tpu.accdoa import decode_accdoa_to_grid_jnp

                return decode_accdoa_to_grid_jnp(
                    avg, grid_cfg.n_el, grid_cfg.n_az, grid_cfg.num_classes,
                    self.accdoa_threshold,
                )
            return jnp.argmax(avg, axis=2).astype(jnp.int8)

        @jax.jit
        def forward_probs_tta(qtree, state, mel):  # (B, win, ...) rep, f16
            # the TTA average IS the averageable representation for every
            # kind (grid: mean probs; accdoa: mean inverse-rotated
            # vectors; multi_accdoa: mean cell-activity votes)
            return tta_fwd((qtree, state), mel).astype(jnp.float16)

        self._forward = lambda state, mel: forward_tta(
            self._quant_tree, state, mel
        )
        self._forward_probs = lambda state, mel: forward_probs_tta(
            self._quant_tree, state, mel
        )
        self._tta_transforms = sel
        self._tta_fold = int(fold)
        get_logger().info(
            "Predictor: TTA enabled (%d transforms%s)", len(sel),
            ", int8" if self.quantized else "",
        )
        return self

    def quantize(self, calib_waves=None, calib_mel=None,
                 weight_only: bool = False):
        """Switch this predictor to int8 post-training-quantized serving
        (seld_tpu.quant): trunk convs, denses, and the grid head run
        s8 x s8 -> s32 on the MXU; activation scales are calibrated on
        `calib_waves` (raw (C, N) float32 waveforms) and/or `calib_mel`
        ((B, win, C, F) feature batches). `weight_only=True` quantizes
        weights only (int8 storage, original-precision compute —
        near-float accuracy, smaller exports, no MXU int8 speedup).
        Streaming keeps its bitwise stream==offline contract in either
        mode (the quantized forward is still row-wise
        content-independent at the fixed batch shape)."""
        if self.state is None:
            raise RuntimeError(
                "artifact-backed predictors cannot re-quantize: int8 is "
                "baked at export time (export --int8-calib-wavs)"
            )
        from seld_tpu.quant import quantize_model

        cfg = self.cfg
        batches = []
        if calib_waves is not None:
            win = self.win
            for wave in calib_waves:
                mel = compute_mel_features(np.asarray(wave, np.float32),
                                           cfg.features)
                n = max(mel.shape[0] // win, 1)
                pad = n * win - mel.shape[0]
                if pad > 0:
                    mel = np.concatenate(
                        [mel, np.zeros((pad, *mel.shape[1:]), mel.dtype)]
                    )
                batches.append(
                    mel[: n * win].reshape(n, win, *mel.shape[1:])
                )
        if calib_mel is not None:
            batches.extend(np.asarray(b, np.float32) for b in calib_mel)
        if not batches:
            raise ValueError(
                "int8 quantization needs calibration data: pass "
                "calib_waves and/or calib_mel"
            )
        variables = self.state.variables()
        self._quant_tree = quantize_model(
            self.model, variables, batches, weight_only=weight_only
        )

        grid_cfg = cfg.grid

        # The quant tree rides as a jit ARGUMENT (partial-bound here),
        # not a closure: closed-over int8 weights would inline into the
        # HLO as constants (remote compiles over the tunnel reject very
        # large programs), and a re-quantize would keep serving the
        # stale tree through the old jit cache entry. Baked-in constants
        # are only right for export_serving's standalone artifact.
        @jax.jit
        def forward_q(qtree, state, mel):
            out = self._raw_apply(qtree, state, mel)
            if self.accdoa_mode:
                from seld_tpu.models.registry import MULTI_ACCDOA_MODELS

                if cfg.model.model_type in MULTI_ACCDOA_MODELS:
                    from seld_tpu.accdoa import (
                        decode_multi_accdoa_to_grid_jnp as decode_jnp,
                    )
                else:
                    from seld_tpu.accdoa import decode_accdoa_to_grid_jnp as decode_jnp
                return decode_jnp(
                    out, grid_cfg.n_el, grid_cfg.n_az, grid_cfg.num_classes,
                    self.accdoa_threshold,
                )
            return jnp.argmax(out, axis=2).astype(jnp.int8)

        @jax.jit
        def forward_probs_q(qtree, state, mel):
            return self._rep_from_raw(self._raw_apply(qtree, state, mel))

        self._forward = lambda state, mel: forward_q(
            self._quant_tree, state, mel
        )
        self._forward_probs = lambda state, mel: forward_probs_q(
            self._quant_tree, state, mel
        )
        self.quantized = True
        get_logger().info(
            "Predictor: int8 PTQ enabled (%d quantized layers, %d "
            "calibration batches)", len(self._quant_tree), len(batches)
        )
        if self._tta_transforms is not None:
            # tta() was enabled before quantize(): rebuild the TTA
            # forwards on top of the fresh quant tree.
            return self.tta(self._tta_transforms, fold=self._tta_fold)
        return self

    def _batched(self, windows, fn):
        """Run fn over static-shape window batches, yielding valid rows.

        EVERY batch (including partials) is zero-padded to the full
        `batch_windows` shape so the forward runs through ONE executable
        regardless of how windows arrive. This is load-bearing for the
        streaming bit-equality contract: XLA executables for different
        batch shapes accumulate matmuls in different orders (~1e-6 f32
        logit noise measured between the batch-1 and batch-8 programs),
        so per-window results are only deterministic across the offline
        and streaming paths if both use the same batch shape. At a fixed
        shape the forward is row-wise content-independent (eval-mode BN;
        verified bitwise for all grid backbones), so the padding rows
        cannot perturb the valid rows. A single shape also means a
        single (slow, remote) TPU compile instead of one per pow-2 tier.
        Lower streaming push latency => construct the predictor with a
        smaller batch_windows (applies consistently to both paths)."""
        if self.dispatch is not None and windows.shape[0] > 0:
            yield self.dispatch(fn, windows)
            return
        bw = self.batch_windows
        for start in range(0, windows.shape[0], bw):
            chunk = windows[start : start + bw]
            n_valid = chunk.shape[0]
            if n_valid < bw:
                chunk = np.concatenate([
                    chunk,
                    np.zeros((bw - n_valid, *chunk.shape[1:]), chunk.dtype),
                ])
            yield np.asarray(fn(self.state, jnp.asarray(chunk)))[:n_valid]

    def _smooth(self, classes: np.ndarray) -> np.ndarray:
        """Temporal majority smoothing on an ASSEMBLED (T, G) grid (the
        median_filter decode option); identity at width 0/1."""
        if self.median_filter <= 1:
            return classes
        from seld_tpu.postprocess import smooth_classes

        return smooth_classes(
            classes, self.median_filter, self.cfg.grid.num_classes
        )

    def predict_waveform(self, wave: np.ndarray, overlap: float = 0.0) -> Prediction:
        """wave: float32 (C, N) at the configured sample rate.

        overlap=0 tiles non-overlapping windows (one argmax pass).
        overlap in (0, 1) strides windows at hop = win*(1-overlap) and
        AVERAGES the per-frame representation over overlapping coverage
        before decoding — smoother decisions at window boundaries, at
        the cost of 1/(1-overlap) more compute and a host-side float32
        accumulator (grid models: class-major (T, M, G) probabilities,
        ~110 MB per audio minute; ACCDOA: (T, C, 3) vectors;
        multi-ACCDOA: (T, C, G) class-activity votes — see
        _rep_from_raw/_decode_avg).
        """
        if overlap < 0.0:
            raise ValueError(f"overlap must be in [0, 1), got {overlap}")
        cfg = self.cfg
        mel = compute_mel_features(wave, cfg.features)  # (T, C, F)
        t_total = mel.shape[0]
        win = self.win

        if overlap == 0.0:
            n_windows = -(-t_total // win)  # non-overlapping tiling
            pad_t = n_windows * win - t_total
            if pad_t:
                mel = np.concatenate(
                    [mel, np.zeros((pad_t, *mel.shape[1:]), mel.dtype)], axis=0
                )
            windows = mel.reshape(n_windows, win, *mel.shape[1:])
            outs = list(self._batched(windows, self._forward))
            classes = np.concatenate(outs, axis=0).reshape(n_windows * win, -1)
            return Prediction(
                classes=self._smooth(classes[:t_total]),
                n_el=cfg.grid.n_el,
                n_az=cfg.grid.n_az,
                num_classes=cfg.grid.num_classes,
            )

        if not 0.0 < overlap < 1.0:
            raise ValueError(f"overlap must be in [0, 1), got {overlap}")
        hop = max(int(win * (1.0 - overlap)), 1)
        starts = list(range(0, max(t_total - win, 0) + 1, hop))
        if starts[-1] + win < t_total:  # tail coverage
            starts.append(max(t_total - win, 0))
        pad_t = starts[-1] + win - t_total
        if pad_t > 0:
            mel = np.concatenate(
                [mel, np.zeros((pad_t, *mel.shape[1:]), mel.dtype)], axis=0
            )
        windows = np.stack([mel[s : s + win] for s in starts])

        # representation-shaped accumulation (see _rep_from_raw): probs
        # for grid models, vectors for ACCDOA, class-activity votes for
        # multi-ACCDOA — averaged over coverage, decoded by _decode_avg.
        prob_sum = None
        count = None
        row = 0
        for probs in self._batched(windows, self._forward_probs):
            if prob_sum is None:
                rep = probs.shape[2:]
                total = t_total + max(pad_t, 0)
                prob_sum = np.zeros((total, *rep), np.float32)
                count = np.zeros((total,) + (1,) * len(rep), np.float32)
            for p in probs:  # (win, *rep)
                s = starts[row]
                prob_sum[s : s + win] += p.astype(np.float32)
                count[s : s + win] += 1.0
                row += 1
        avg = prob_sum[:t_total] / np.maximum(count[:t_total], 1.0)
        return Prediction(
            classes=self._smooth(self._decode_avg(avg)),
            n_el=cfg.grid.n_el,
            n_az=cfg.grid.n_az,
            num_classes=cfg.grid.num_classes,
        )

    def predict_file(self, wav_path, csv_out=None, overlap: float = 0.0,
                     stream: bool = False) -> Prediction:
        """Decode a WAV, predict, optionally write STARSS22-style CSV.

        stream=True routes through the bounded-memory StreamingSession
        (1 s chunks; bit-equal output, composes with overlap)."""
        wave, sr = load_wav(wav_path)
        if sr != self.cfg.features.sample_rate:
            raise ValueError(
                f"{wav_path}: sample rate {sr} != configured "
                f"{self.cfg.features.sample_rate}"
            )
        if stream:
            from seld_tpu.stream import stream_predict

            chunks = np.array_split(wave, max(1, wave.shape[1] // sr), axis=1)
            pred = stream_predict(self, chunks, overlap=overlap)
        else:
            pred = self.predict_waveform(wave, overlap=overlap)
        if not (pred.classes != pred.background_class).any():
            get_logger().warning(
                "%s: no events detected (all cells background) — an "
                "undertrained model predicts background everywhere",
                wav_path,
            )
        if csv_out is not None:
            rows = pred.to_metadata_rows()
            Path(csv_out).parent.mkdir(parents=True, exist_ok=True)
            np.savetxt(csv_out, rows, fmt="%d", delimiter=",")
        return pred
