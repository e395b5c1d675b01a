"""Visualization artifacts: loss curves, grid predictions, loss components.

Capability parity with ref visualization.py (Agg backend, PNG artifacts):
  * plot_loss_curves — train/test curves with best-epoch markers
    (ref visualization.py:262-306)
  * visualize_grid_predictions — GT / prediction / difference class grids
    for one frame with per-frame accuracy (ref visualization.py:308-394)
  * visualize_loss_components — dashboard of the loss internals: GT/pred
    activity, event masks, AIUR intersection/union, CL attention map and
    contribution (ref visualization.py:12-260)
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _save_or_return(fig, save_path):
    if save_path is not None:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_loss_curves(train_losses, test_losses, save_path=None):
    epochs = np.arange(1, len(train_losses) + 1)
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.plot(epochs, train_losses, label="train", lw=1.8)
    ax.plot(epochs, test_losses, label="test", lw=1.8)
    if len(train_losses):
        bt = int(np.argmin(train_losses))
        bv = int(np.argmin(test_losses))
        ax.scatter([bt + 1], [train_losses[bt]], marker="*", s=140, zorder=5)
        ax.scatter([bv + 1], [test_losses[bv]], marker="*", s=140, zorder=5)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_title("Training / test loss")
    ax.legend()
    ax.grid(alpha=0.3)
    return _save_or_return(fig, save_path)


def _class_grid(labels_or_logits, n_el, n_az):
    """(G, M) -> (I, J) argmax class map."""
    g = labels_or_logits.reshape(n_el, n_az, -1)
    return np.argmax(g, axis=-1)


def visualize_grid_predictions(
    ground_truth,
    predictions,
    time_frame: int = 0,
    grid_size=(18, 36),
    num_classes: int = 14,
    title_prefix: str = "",
    save_path=None,
):
    """3-panel GT / prediction / agreement plot for one frame's (G, M)."""
    n_el, n_az = grid_size
    gt = _class_grid(np.asarray(ground_truth), n_el, n_az)
    pred = _class_grid(np.asarray(predictions), n_el, n_az)
    bg = num_classes - 1

    fig, axes = plt.subplots(1, 3, figsize=(18, 4.5))
    for ax, data, title in [
        (axes[0], gt, "ground truth"),
        (axes[1], pred, "prediction"),
    ]:
        im = ax.imshow(
            np.ma.masked_equal(data, bg), origin="lower",
            extent=[-180, 180, -90, 90], aspect="auto",
            cmap="tab20", vmin=0, vmax=num_classes - 1,
        )
        ax.set_title(f"{title_prefix}{title} (frame {time_frame})")
        ax.set_xlabel("azimuth (deg)")
        ax.set_ylabel("elevation (deg)")
        fig.colorbar(im, ax=ax, shrink=0.8)

    agree = (gt == pred).astype(float)
    axes[2].imshow(
        agree, origin="lower", extent=[-180, 180, -90, 90], aspect="auto",
        cmap="RdYlGn", vmin=0, vmax=1,
    )
    acc = float(agree.mean()) * 100
    nb = gt != bg
    nb_acc = float((gt[nb] == pred[nb]).mean()) * 100 if nb.any() else float("nan")
    axes[2].set_title(f"agreement — acc {acc:.1f}% / non-bg {nb_acc:.1f}%")
    axes[2].set_xlabel("azimuth (deg)")
    fig.tight_layout()
    return _save_or_return(fig, save_path)


def visualize_loss_components(
    logits,
    labels,
    n_el: int = 18,
    n_az: int = 36,
    frame_idx: int = 0,
    epoch=None,
    save_dir=None,
):
    """Loss-internals dashboard for one (B, T, G, M) batch's chosen frame:
    activity maps, event masks, AIUR intersection/union, CL attention map
    y_at and its contribution (ref visualization.py:12-260)."""
    import jax.nn

    logits = np.asarray(logits)
    labels = np.asarray(labels)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    b, t = 0, frame_idx
    m = labels.shape[-1]

    true = labels[b, t].reshape(n_el, n_az, m)
    pred = probs[b, t].reshape(n_el, n_az, m)
    true_act = true[..., :-1].sum(-1)
    pred_act = pred[..., :-1].sum(-1)
    true_mask = (np.argmax(true, -1) != m - 1).astype(float)
    pred_mask = (np.argmax(pred, -1) != m - 1).astype(float)
    inter = true_mask * pred_mask
    union = np.clip(true_mask + pred_mask, 0, 1)

    # CL internals (mirror of losses.converging_localization_loss)
    is_event = true_act > 0.01
    n_bac, n_non = float((~is_event).sum()), float(is_event.sum())
    y_prime = np.where(is_event, -(n_bac / (n_non + 1e-10)), 1.0)
    diff = np.zeros_like(y_prime)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di or dj:
                diff += np.roll(y_prime, (-di, -dj), axis=(0, 1)) - y_prime
    y_at = y_prime + diff / 8.0
    cl_contrib = pred_act * y_at

    panels = [
        (true_act, "GT activity"),
        (pred_act, "pred activity"),
        (true_mask, "GT event mask"),
        (pred_mask, "pred event mask"),
        (inter, "AIUR intersection"),
        (union, "AIUR union"),
        (y_prime, "CL y'"),
        (y_at, "CL attention y_at"),
        (cl_contrib, "CL contribution"),
    ]
    fig, axes = plt.subplots(3, 3, figsize=(16, 10))
    for ax, (data, title) in zip(axes.ravel(), panels):
        im = ax.imshow(data, origin="lower", aspect="auto", cmap="viridis")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.8)
    iou = inter.sum() / max(union.sum(), 1e-8)
    fig.suptitle(
        f"loss components — epoch {epoch}, frame {frame_idx}, IoU {iou:.3f}"
    )
    fig.tight_layout()
    save_path = None
    if save_dir is not None:
        save_path = Path(save_dir) / f"loss_components_epoch{epoch}_f{frame_idx}.png"
    return _save_or_return(fig, save_path)
