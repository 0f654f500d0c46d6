"""Visual-debugging helpers.

Capability parity with reference seaweed_apt/helper.py:20-120
(`detailed_model_output_visualization`: target/output/diff heatmaps +
error histograms + RMSE) and graph.py:16-165 (`VisualizationHook`:
per-layer activation capture + plots). The hook variant is functional:
activations come from `wan_model_forward(collect_layers=...)` instead of
torch forward hooks.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from omnihuman_tpu.utils.logging import logger


def detailed_model_output_visualization(
    target: np.ndarray, output: np.ndarray,
    save_path: str = "model_output_visualization.png",
    channel: int = 0, frame: int = 0,
) -> Dict[str, float]:
    """Target / output / |diff| heatmaps + error histogram + stats
    (reference helper.py:20-120). Arrays: [C, F, H, W] or [B, C, F, H, W].
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = np.asarray(target, np.float32)
    o = np.asarray(output, np.float32)
    if t.ndim == 5:
        t, o = t[0], o[0]
    t2d, o2d = t[channel, frame], o[channel, frame]
    diff = np.abs(t2d - o2d)
    err = (t - o).ravel()
    rmse = float(np.sqrt(np.mean(err ** 2)))

    fig, axes = plt.subplots(2, 2, figsize=(11, 9))
    for ax, (img, title) in zip(
            axes.flat[:3],
            [(t2d, "target"), (o2d, "output"), (diff, "|target-output|")]):
        im = ax.imshow(img, cmap="viridis")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, fraction=0.046)
    axes[1, 1].hist(err, bins=80, color="tab:red", alpha=0.7)
    axes[1, 1].set_title(f"error histogram (rmse={rmse:.4f})")
    fig.tight_layout()
    fig.savefig(save_path, dpi=110)
    plt.close(fig)

    stats = {
        "rmse": rmse,
        "mae": float(np.mean(np.abs(err))),
        "max_err": float(np.max(np.abs(err))),
        "target_std": float(t.std()),
        "output_std": float(o.std()),
    }
    logger.info(f"viz saved → {save_path}; {stats}")
    return stats


class VisualizationHook:
    """Per-layer activation statistics + plots (reference graph.py:16-165,
    hooks replaced by explicit `collect_layers` taps)."""

    def __init__(self, output_dir: str = "viz"):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

    def capture(self, params, x, t, context, *, cfg, seq_len, rope_sin,
                rope_cos, layers: Optional[Sequence[int]] = None, **kw
                ) -> Dict[int, np.ndarray]:
        from omnihuman_tpu.models.wan_dit import wan_model_forward
        layers = tuple(layers if layers is not None
                       else range(cfg.num_layers))
        _, taps = wan_model_forward(
            params, x, t, context, cfg=cfg, seq_len=seq_len,
            rope_sin=rope_sin, rope_cos=rope_cos,
            collect_layers=layers, **kw)
        return {k: np.asarray(v) for k, v in taps.items()}

    def plot_layer_stats(self, taps: Dict[int, np.ndarray],
                         name: str = "layer_stats") -> str:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        idx = sorted(taps)
        means = [float(taps[i].mean()) for i in idx]
        stds = [float(taps[i].std()) for i in idx]
        norms = [float(np.linalg.norm(taps[i]) / taps[i].size ** 0.5)
                 for i in idx]

        fig, axes = plt.subplots(1, 3, figsize=(14, 4))
        for ax, (ys, title) in zip(axes, [(means, "mean"), (stds, "std"),
                                          (norms, "rms norm")]):
            ax.plot(idx, ys, marker="o")
            ax.set_xlabel("layer")
            ax.set_title(f"activation {title}")
        fig.tight_layout()
        path = os.path.join(self.output_dir, f"{name}.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path

    def plot_attention_token_norm(self, taps: Dict[int, np.ndarray],
                                  layer: int,
                                  name: str = "token_norms") -> str:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        act = taps[layer][0]                     # [S, dim]
        norms = np.linalg.norm(act, axis=-1)
        fig, ax = plt.subplots(figsize=(10, 3))
        ax.plot(norms)
        ax.set_title(f"layer {layer} per-token activation norm")
        ax.set_xlabel("token")
        fig.tight_layout()
        path = os.path.join(self.output_dir, f"{name}_L{layer}.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
