"""Configuration registry for seld_tpu.

Re-designs the reference's `Config` class-of-constants (ref: config.py:3-118)
as composable frozen dataclasses with dotted-path CLI overrides, preserving
every knob the reference exposes (model selection, DSP params, windowing,
grid geometry, optimizer/scheduler/early-stop/checkpoint policy, loss
weights, dataset paths and the single-file debug mode) and adding the
TPU-specific knobs the reference has no concept of (mesh shape, dtype
policy, Pallas kernel toggles).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, replace
from pathlib import Path
from typing import Any, Tuple

# STARSS22 class map (ref: config.py:21-36). Index 13 is the background class.
STARSS22_CLASSES = {
    0: "Female speech, woman speaking",
    1: "Male speech, man speaking",
    2: "Clapping",
    3: "Telephone",
    4: "Laughter",
    5: "Domestic sounds",
    6: "Walk, footsteps",
    7: "Door, open or close",
    8: "Music",
    9: "Musical instrument",
    10: "Water tap, faucet",
    11: "Bell",
    12: "Knock",
    13: "Background",
}


@dataclass(frozen=True)
class DataConfig:
    """Dataset paths, discovery, and the single-file debug mode.

    ref: config.py:6-18 (paths + USE_FULL_DATASET), config.py:105-118
    (Sony/TAU split directories).
    """

    base_path: str = "."
    audio_dirname: str = "foa_dev"
    metadata_dirname: str = "metadata_dev"
    output_dirname: str = "outputs"
    checkpoint_dirname: str = "checkpoints"

    use_full_dataset: bool = True
    train_audio_file: str = "fold3_room21_mix001.wav"
    train_meta_file: str = "fold3_room21_mix001.csv"
    test_audio_file: str = "fold4_room23_mix001.wav"
    test_meta_file: str = "fold4_room23_mix001.csv"

    # Host-side input pipeline (TPU addition; the reference uses 2 DataLoader
    # workers, ref main.py:64).
    prefetch_depth: int = 2
    shuffle_seed: int = 0
    # On-disk corpus/feature cache (TPU addition; the reference rebuilds the
    # corpus eagerly every run, ref dataset.py:212-317). Empty = off. Keyed
    # on the file list (path/size/mtime) + feature/grid/window/target
    # configs, so edits and knob changes invalidate automatically.
    cache_dir: str = ""

    @property
    def audio_path(self) -> Path:
        return Path(self.base_path) / self.audio_dirname

    @property
    def metadata_path(self) -> Path:
        return Path(self.base_path) / self.metadata_dirname

    @property
    def output_path(self) -> Path:
        return Path(self.base_path) / self.output_dirname

    @property
    def checkpoint_path(self) -> Path:
        return Path(self.base_path) / self.checkpoint_dirname

    def split_dirs(self, split: str) -> list[tuple[Path, Path]]:
        """(audio_dir, metadata_dir) pairs for a split in {train, test}."""
        assert split in ("train", "test"), split
        out = []
        for site in ("sony", "tau"):
            sub = f"dev-{split}-{site}"
            out.append((self.audio_path / sub, self.metadata_path / sub))
        return out


@dataclass(frozen=True)
class FeatureConfig:
    """Signal-processing front-end (ref: config.py:85-92).

    The reference computes per-channel torchaudio MelSpectrogram
    (power=2, hann, center/reflect-pad, HTK mel scale, no filterbank norm)
    followed by AmplitudeToDB (10*log10, amin=1e-10, no top-db)
    (ref: dataset.py:27-58). Those exact semantics are the parity contract
    for seld_tpu.features.
    """

    sample_rate: int = 24_000
    n_fft: int = 960  # int(0.04 * 24000) — 40 ms
    hop_length: int = 480  # int(0.02 * 24000) — 20 ms -> 50 fps
    n_mels: int = 64
    f_min: float = 0.0
    f_max: float | None = None  # defaults to sample_rate / 2
    power: float = 2.0
    amin: float = 1e-10
    top_db: float | None = None
    use_pallas: bool = True  # fused Pallas mel kernel on TPU; jnp path is the oracle
    # Feature stack (seld_tpu.features.spatial): "mel" (4ch, reference
    # parity), "mel_iv" (+3 FOA intensity-vector channels), "mel_gcc"
    # (+6 GCC-PHAT channels). The reference supports only "mel"; the
    # spatial sets are the BASELINE.json north-star features.
    feature_set: str = "mel"

    @property
    def frames_per_second(self) -> int:
        return self.sample_rate // self.hop_length


@dataclass(frozen=True)
class GridConfig:
    """Spatial-grid geometry (ref: config.py:94-97, dataset.py:190-192)."""

    cell_degrees: int = 10
    num_classes: int = 14  # includes background at index num_classes-1

    @property
    def n_el(self) -> int:  # I in the reference
        return int(180 // self.cell_degrees)

    @property
    def n_az(self) -> int:  # J in the reference
        return int(360 // self.cell_degrees)

    @property
    def n_cells(self) -> int:
        return self.n_el * self.n_az

    @property
    def background_class(self) -> int:
        return self.num_classes - 1


@dataclass(frozen=True)
class WindowConfig:
    """Corpus windowing (ref: config.py:91-92, dataset.py:194-200).

    5 s windows with a 1 s hop over the concatenated corpus; the last
    window is padded with zeros / background labels
    (ref: dataset.py:282-300).
    """

    window_seconds: float = 5.0
    hop_seconds: float = 1.0

    def window_frames(self, feat: FeatureConfig) -> int:
        return int(self.window_seconds * feat.sample_rate / feat.hop_length)

    def hop_frames(self, feat: FeatureConfig) -> int:
        return int(self.hop_seconds * feat.sample_rate / feat.hop_length)


@dataclass(frozen=True)
class TargetConfig:
    """Label rasterization + Gaussian spatial augmentation.

    ref: dataset.py:60-119 (point targets, 100 ms metadata frame fanned out
    to 5x 20 ms label frames) and smrl_seld_gaussian.py:397-535 (per-source
    fixed Gaussian displacement + 2-sigma rectangular region painting,
    azimuth wraparound by shortest angular distance).
    """

    metadata_frame_ms: int = 100
    label_frame_ms: int = 20
    use_gaussian_augmentation: bool = False  # train-side only, like the monolith
    sigma_azimuth: float = 5.0
    sigma_elevation: float = 5.0
    augmentation_seed: int = 0
    # Max simultaneous metadata rows per file the vectorized rasterizer is
    # padded to (static shape for jit); files with more rows fall back to
    # chunked rasterization.
    max_rows_per_chunk: int = 4096
    # Also build ACCDOA targets (per-(frame,class) Cartesian DOA vectors,
    # seld_tpu.accdoa) alongside the grid bitmask.
    accdoa: bool = False
    # 1 = single-ACCDOA (T, C, 3) targets; >1 = multi-ACCDOA: ADPIT
    # (T, 6, 4, C) targets supporting same-class overlapping sources.
    accdoa_tracks: int = 1

    @property
    def fanout(self) -> int:
        return self.metadata_frame_ms // self.label_frame_ms  # = 5


@dataclass(frozen=True)
class ModelConfig:
    """Backbone selection + per-model hyperparameters (ref: config.py:38-60)."""

    model_type: str = "resnet_conformer"  # cnn | crnn | conformer | resnet_conformer
    num_classes: int = 14
    n_channels: int = 4
    n_mels: int = 64

    # CRNN (ref: config.py:43-47)
    crnn_cnn_channels: Tuple[int, ...] = (64, 128, 256, 512)
    crnn_rnn_hidden: int = 256
    crnn_rnn_layers: int = 2
    crnn_dropout: float = 0.3

    # Conformer (ref: config.py:49-54)
    conf_d_model: int = 256
    conf_n_heads: int = 4
    conf_n_layers: int = 2
    conf_kernel_size: int = 31
    conf_dropout: float = 0.3

    # ResNet50-Conformer (ref: config.py:56-60)
    resnet_conf_d_model: int = 512
    resnet_conf_n_heads: int = 8
    resnet_conf_n_layers: int = 4
    resnet_dropout: float = 0.3

    # CSPDarkNet (ref: model.py:134-141)
    csp_use_small: bool = True

    # TPU dtype policy: bf16 activations/compute with f32 params & loss.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # BatchNorm/LayerNorm arithmetic dtype. Statistics (mean/var) are
    # always reduced in float32 inside flax regardless of this setting;
    # "bfloat16" makes the normalize/scale elementwise math match the
    # compute dtype, halving HBM traffic through the ~50 norm layers.
    norm_dtype: str = "float32"
    # Activation checkpointing (jax.checkpoint / nn.remat) — recompute
    # instead of saving activations in the backward pass:
    #   'none' | 'conformer' (conformer blocks) | 'resnet' (bottlenecks)
    #   | 'all'
    remat: str = "none"


@dataclass(frozen=True)
class LossConfig:
    """Composite loss selection (ref: config.py:71-74, loss.py:6-172).

    The reference's modular path activates only the class term
    (loss.py:166); the gaussian monolith activates all three
    (smrl_seld_gaussian.py:1059-1070). `use_aiur`/`use_cl` select between
    those behaviors explicitly.
    """

    loss_type: str = "mse"  # 'ce' | 'mse'
    w_class: float = 1.0
    w_aiur: float = 1.0
    w_cl: float = 1.0
    use_aiur: bool = False
    use_cl: bool = False
    # CE class weighting: events 1.0, background 0.05 (ref: trainer.py:99-101)
    background_class_weight: float = 0.05


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / early stop / checkpoint policy (ref: config.py:62-82)."""

    num_epochs: int = 30
    batch_size: int = 16
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    lr_decay_factor: float = 0.5
    lr_decay_patience: int = 5
    # LR schedule: "plateau" (reference semantics: ReduceLROnPlateau on
    # test loss) or "cosine" (per-step warmup + cosine decay over the
    # whole run — the large-batch recipe; plateau rewrites are disabled).
    lr_schedule: str = "plateau"
    warmup_steps: int = 0  # cosine only; linear 0 -> lr over N steps
    cosine_final_scale: float = 0.01  # cosine floor as a fraction of lr
    # Early stopping on *train* loss (ref: trainer.py:262-270)
    patience: int = 20
    min_delta: float = 1e-4
    # Checkpoints: best on test loss + rolling every N, keep last K
    # (ref: trainer.py:273-308, config.py:80-82)
    save_every_n_epochs: int = 5
    # Best-checkpoint selection criterion. "loss" (reference parity:
    # lowest test loss) or an official DCASE2022 validation metric
    # computed every epoch from decoded prediction grids:
    #   "seld_error" (lower is better), "er" (lower), "f_macro" (higher).
    # Metric selection adds a device->host grid read-back per eval batch
    # and records the per-epoch DCASE2022 summary in metrics.jsonl.
    # Early stopping (train loss) and LR plateau (test loss) keep their
    # reference semantics either way. Single-process runs only.
    select_metric: str = "loss"
    keep_last_n_checkpoints: int = 3
    seed: int = 0
    # PRNG implementation for the training RNG stream (dropout masks).
    # "rbg" (XLA's hardware bit generator) measured 22% faster per train
    # step than "threefry" on v5e at batch 16 — XLA rematerializes the
    # threefry bits in the backward pass, costing ~7 ms/step on the
    # flagship. Streams differ between impls; both are deterministic
    # per seed on a given backend.
    prng_impl: str = "rbg"
    # Gradient accumulation: split each batch into N microbatches inside
    # the jitted step (lax.scan), combine gradients weighted by each
    # microbatch's share of the example mask, apply ONE optimizer update
    # — effective batches larger than HBM allows, at one microbatch of
    # activations in memory. Gradients match the full-batch step exactly
    # for em-normalized decomposable losses (MSE, AIUR), padded tail
    # batches included; weighted CE and CL normalize per microbatch, and
    # BatchNorm draws its train-mode statistics per microbatch (the
    # standard accumulation caveats). batch_size must divide evenly.
    accum_steps: int = 1
    # Quantization-aware training: eligible layers (the int8 PTQ set —
    # trunk convs, denses, grid head) fake-quantize weights and
    # activations to the int8 grid with straight-through gradients
    # inside the jitted step, so trained weights survive int8 serving
    # (`predict --int8`) with minimal accuracy loss.
    qat: bool = False
    # Exponential moving average of parameters (0 = off). When on, the
    # EMA weights are what gets evaluated each epoch and stored in the
    # BEST checkpoint (the serving artifact); rolling checkpoints keep
    # the raw weights for exact resume (EMA restarts from the restored
    # raw params on resume). A production-training extra the reference
    # does not have.
    ema_decay: float = 0.0
    # Knowledge distillation (empty = off): path to a trained TEACHER
    # checkpoint tree. The teacher (architecture from the ckpt-embedded
    # config, BEST weights — EMA if it trained with ema_decay) runs an
    # eval-mode forward on the student's augmented batches inside the
    # jitted step, and the objective becomes
    #   (1 - alpha) * hard_loss + alpha * kd_loss
    # with kd = T^2-scaled KL over classes (grid heads) or vector MSE
    # (ACCDOA). Teacher and student must share features/window/grid and
    # output kind; architectures may differ (flagship teacher -> cheap
    # serving student). seld_tpu/distill.py. A production-serving extra
    # the reference does not have.
    distill_ckpt: str = ""
    distill_alpha: float = 0.5
    distill_temperature: float = 2.0
    # Multi-ACCDOA KD track matching: "permutation" (default) matches
    # student to teacher tracks with a per-(frame, class) min over the
    # N! track orderings — permutation-invariant, like the hard ADPIT
    # loss, so students are not penalized near teacher track-swap
    # boundaries. "position" is the plain slot-wise MSE. Grid and
    # single-ACCDOA distillation ignore this knob.
    distill_track_matching: str = "permutation"
    # SpecAugment (on-device, inside the jitted step; 0 masks = off).
    # A north-star extra — the reference only augments labels
    # (smrl_seld_gaussian.py:397-535), never features.
    specaugment_time_masks: int = 0
    specaugment_time_width: int = 25  # frames (0.5 s at 50 fps)
    specaugment_freq_masks: int = 0
    specaugment_freq_width: int = 8  # mel bins
    # FOA spatial augmentation (ACS): per-sample draw from the 16
    # label-exact scene transforms (90-deg azimuth rotations, azimuth
    # reflection, elevation flip) applied to features AND labels inside
    # the jitted step. Requires features.feature_set="mel_iv" (signed
    # direction information) and a grid model; seld_tpu/features/acs.py.
    acs_augment: bool = False
    log_every_steps: int = 10
    # jax.profiler trace of the first N steps of the first epoch into
    # <output>/profile (TPU addition; the reference has no profiling,
    # SURVEY §5).
    profile_steps: int = 0
    # Render the loss-component dashboard from one test batch every N
    # epochs (0 = off). The gaussian monolith renders every 5
    # (ref smrl_seld_gaussian.py:1629-1650); the modular path has it
    # disabled (ref trainer.py:317-339).
    viz_loss_components_every: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout (TPU addition; the reference is single-GPU).

    axes: data (batch sharding), model (tensor-parallel sharding of wide
    layers). Defaults to all devices on the data axis.

    enable: "auto" builds a mesh when >1 device is visible on a real
    accelerator backend; "on" forces one (incl. virtual CPU devices —
    note single-core CPU emulation can starve 8-way collective
    rendezvous on long programs); "off" stays single-device.
    """

    enable: str = "auto"
    data_axis: int = -1  # -1 => all remaining devices
    model_axis: int = 1
    # ZeRO-1: shard Adam moments over the data axis (saves ~2/3 of
    # optimizer memory per chip at the cost of an update all-gather).
    shard_opt_state: bool = False
    # ZeRO-3 / FSDP: additionally shard the PARAMETERS (and therefore
    # their gradients and moments) over the data axis. GSPMD inserts the
    # per-layer all-gather before each use and reduce-scatters the
    # gradients — full-state memory drops ~linearly with the data-axis
    # size, paid for with ICI traffic each step. Small leaves (norms,
    # biases) stay replicated. Composes with tensor parallelism (TP
    # rules take precedence) and implies shard_opt_state for the
    # FSDP-sharded leaves.
    shard_params: bool = False
    # Sequence parallelism: shard the TIME axis of (B, T, ...) batches
    # over the model mesh axis — GSPMD partitions the whole network over
    # time (convs get halo exchanges, attention einsums their
    # collectives). For long-window training of the attention models;
    # mutually exclusive with tensor parallelism (the model axis carries
    # time, so the TP weight rules are disabled) and unsupported for the
    # recurrent crnn (the GRU scans time sequentially). The Pallas flash
    # attention is bypassed under time sharding (einsum attention
    # partitions; flash stays the single-chip long-T path).
    shard_time: bool = False


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    features: FeatureConfig = field(default_factory=FeatureConfig)
    grid: GridConfig = field(default_factory=GridConfig)
    window: WindowConfig = field(default_factory=WindowConfig)
    targets: TargetConfig = field(default_factory=TargetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace_path(self, path: str, value: Any) -> "Config":
        """Return a new Config with `path` (e.g. 'train.batch_size') replaced."""
        head, _, rest = path.partition(".")
        if not rest:
            return replace(self, **{head: value})
        sub = getattr(self, head)
        new_sub = _replace_nested(sub, rest, value)
        return replace(self, **{head: new_sub})


def _replace_nested(obj: Any, path: str, value: Any) -> Any:
    head, _, rest = path.partition(".")
    if rest:
        return replace(obj, **{head: _replace_nested(getattr(obj, head), rest, value)})
    return replace(obj, **{head: _coerce(obj, head, value)})


def _coerce(obj: Any, name: str, value: Any) -> Any:
    """Coerce a string CLI value to the declared field type."""
    if not isinstance(value, str):
        return value
    for f in fields(obj):
        if f.name == name:
            current = getattr(obj, name)
            if isinstance(current, bool) or f.type in ("bool",):
                return value.lower() in ("1", "true", "yes", "on")
            if isinstance(current, int) and not isinstance(current, bool):
                return int(value)
            if isinstance(current, float):
                return float(value)
            if isinstance(current, tuple):
                return tuple(int(v) for v in value.strip("()[] ").split(",") if v)
            if current is None:
                try:
                    return float(value)
                except ValueError:
                    return value
            return value
    raise KeyError(f"unknown config field {name!r} on {type(obj).__name__}")


def parse_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply `a.b.c=value` CLI overrides (the flag system the reference
    lacks — ref behavior is editing config.py by hand, SURVEY §5)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must be key=value")
        key, _, val = ov.partition("=")
        cfg = cfg.replace_path(key.strip(), val.strip())
    return cfg


def config_to_dict(cfg: Any) -> dict:
    """Serialize a (nested) config to plain dicts — stored inside
    checkpoints so eval can rebuild the exact architecture (designing out
    the reference's config-mismatch hazard, ref trainer.py:430-432)."""
    if dataclasses.is_dataclass(cfg):
        return {f.name: config_to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, tuple):
        return list(cfg)
    return cfg


def config_from_dict(d: dict, cls: type = Config) -> Any:
    kwargs = {}
    for f in fields(cls):
        v = d.get(f.name, dataclasses.MISSING)
        if v is dataclasses.MISSING:
            continue
        if dataclasses.is_dataclass(f.default_factory() if f.default_factory is not dataclasses.MISSING else None):  # type: ignore[misc]
            kwargs[f.name] = config_from_dict(v, type(f.default_factory()))  # type: ignore[misc]
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
