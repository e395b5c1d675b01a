"""Small coverage batch: attention dispatch, custom f_max filterbank,
config forward-compat, standalone viz artifacts."""

import jax.numpy as jnp
import numpy as np

from seld_tpu.config import Config, config_from_dict, config_to_dict


def test_attention_auto_dispatch_on_cpu_uses_einsum(rng):
    # On the CPU backend auto-dispatch must take the einsum path (Pallas
    # compiles only on TPU) and match the explicit einsum result exactly.
    from seld_tpu.ops.attention import multi_head_attention

    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 2, 600, 64)).astype(np.float32))
        for _ in range(3)
    )
    auto = multi_head_attention(q, k, v)  # T=600 >= flash threshold
    einsum = multi_head_attention(q, k, v, use_flash=False)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(einsum))


def test_mel_filterbank_custom_fmax():
    from seld_tpu.features import mel_filterbank

    fb = mel_filterbank(481, 64, 24_000, f_min=50.0, f_max=8000.0)
    freqs = np.linspace(0, 12_000, 481)
    # no filter energy above f_max or below f_min
    assert fb[freqs > 8000.0].sum() == 0.0
    assert fb[freqs < 50.0].sum() == 0.0
    assert fb.sum() > 0


def test_config_from_dict_tolerates_missing_and_extra_keys():
    d = config_to_dict(Config())
    d["train"].pop("seed")  # older checkpoint without the field
    d["unknown_section"] = {"x": 1}  # newer writer's extra section
    cfg = config_from_dict(d)
    assert cfg.train.seed == 0  # default restored
    assert cfg.train.batch_size == 16


def test_plot_loss_curves_artifact(tmp_path):
    from seld_tpu.viz import plot_loss_curves, visualize_grid_predictions

    plot_loss_curves([1.0, 0.5, 0.4], [1.1, 0.7, 0.8],
                     save_path=tmp_path / "curves.png")
    assert (tmp_path / "curves.png").stat().st_size > 0

    gt = np.zeros((14, 648), np.float32)  # class-major (M, G)
    gt[13, :] = 1.0
    gt[13, 100], gt[3, 100] = 0.0, 1.0
    pred = np.random.default_rng(0).standard_normal((14, 648)).astype(np.float32)
    visualize_grid_predictions(gt, pred, save_path=tmp_path / "grid.png")
    assert (tmp_path / "grid.png").stat().st_size > 0


def test_loss_components_dashboard_panels(tmp_path):
    """12-panel parity with ref visualization.py:12-260: GT/pred
    activity+classes+masks+stats, AIUR maps, CL y_at + contribution,
    busiest-frame auto-selection, scalar annotations in the title."""
    import numpy as np

    from seld_tpu.viz import visualize_loss_components

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 6, 14, 648)).astype("float32")
    labels = np.zeros((2, 6, 14, 648), "float32")  # class-major (B,T,M,G)
    labels[:, :, -1, :] = 1.0
    for cell, cls in [(100, 2), (101, 2), (300, 5)]:
        labels[1, 4, :, cell] = 0.0
        labels[1, 4, cls, cell] = 1.0

    fig = visualize_loss_components(logits, labels, epoch=3)
    try:
        axes = fig.get_axes()
        # 12 panels + colorbars (2 stats panels have no colorbar)
        panels = [a for a in axes if a.get_title() or not a.axison]
        assert len(panels) >= 12
        title = fig._suptitle.get_text()
        assert "AIUR" in title and "CL" in title and "IoU" in title
        assert "frame 4" in title and "batch 1" in title  # busiest frame
    finally:
        import matplotlib.pyplot as plt

        plt.close(fig)

    # pinned frame still works
    path_fig = visualize_loss_components(
        logits, labels, frame_idx=0, epoch=3, save_dir=tmp_path
    )
    import matplotlib.pyplot as plt

    plt.close(path_fig)
    assert (tmp_path / "loss_components_epoch3_f0.png").exists()
