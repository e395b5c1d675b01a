"""seld_tpu — a TPU-native Sound Event Localization and Detection framework.

A ground-up JAX/Flax/Pallas/pjit re-design of the capabilities of the
reference SMR-SELD pipeline (Zeudon/sound-event-localization-detection):
4-channel FOA audio -> on-device log-mel front-end -> spatial-grid targets
(18x36 az/el cells x 14 classes) -> CNN/CRNN/Conformer backbones -> composite
loss -> data-parallel training over a jax.sharding.Mesh.

Package layout (maps to SURVEY.md §7):
  config      — dataclass config registry + CLI overrides   (ref config.py)
  grid        — polar->grid geometry, vectorized            (ref utils.py:77-90)
  features/   — on-device STFT/mel front-end + Pallas kernel(ref dataset.py:27-58)
  targets/    — vectorized label rasterizer + Gaussian aug  (ref dataset.py:60-119,
                                                             smrl_seld_gaussian.py:397-535)
  data/       — file discovery, WAV decode, windowed corpus (ref dataset.py:121-330)
  models/     — Flax backbones: CRNN / Conformer /
                CSPDarkNet / ResNet50-Conformer             (ref model*.py, resnet50_model.py)
  losses/     — CE/MSE + AIUR + converging-localization     (ref loss.py)
  train/      — jitted train step, optax, plateau LR,
                early stop, Orbax checkpoints               (ref trainer.py:23-392)
  eval/       — accuracies + DCASE SELD metrics             (ref trainer.py:394-711)
  parallel/   — mesh construction + sharding rules (dp/tp)
  ops/        — Pallas TPU kernels (fused mel, attention)
  viz         — loss curves / grid plots / loss dashboards  (ref visualization.py)
"""

__version__ = "0.1.0"

# Public API surface (lazy where heavy):
from seld_tpu.config import Config, parse_overrides  # noqa: E402,F401


def __getattr__(name):
    """Lazy top-level exports so `import seld_tpu` stays light."""
    if name == "build_model":
        from seld_tpu.models import build_model

        return build_model
    if name == "train_model":
        from seld_tpu.train import train_model

        return train_model
    if name == "evaluate_model":
        from seld_tpu.eval import evaluate_model

        return evaluate_model
    if name == "SELDPredictor":
        from seld_tpu.infer import SELDPredictor

        return SELDPredictor
    raise AttributeError(name)
