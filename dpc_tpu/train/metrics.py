"""Meters, accuracy utilities and observability helpers.

Capability parity with ``utils/utils.py``: AverageMeter with the 5-sample
sliding ``local_avg`` the reference reports at epoch end
(``utils/utils.py:77-113``, ``dpc/main.py:246``), per-class accuracy table,
confusion matrix with SVG rendering, and the ImageNet de-normaliser used
for logging input clips.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Optional

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class AverageMeter:
    """Running value/avg/sum/count plus a sliding local average.

    ``local_avg`` matches the reference: mean of the last ``history`` (=5)
    updates (``utils/utils.py:98-107``).
    """

    def __init__(self, history: int = 5):
        self.history = history
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self._local: deque = deque(maxlen=self.history)

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self._local.append(float(val))

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    @property
    def local_avg(self) -> float:
        return float(np.mean(self._local)) if self._local else 0.0


class MetricBundle:
    """A dict of AverageMeters updated from jax metric dicts."""

    def __init__(self, history: int = 5):
        self.history = history
        self.meters: dict[str, AverageMeter] = {}

    def update(self, metrics: dict, n: int = 1) -> None:
        for k, v in metrics.items():
            self.meters.setdefault(
                k, AverageMeter(self.history)).update(float(v), n)

    def __getitem__(self, k: str) -> AverageMeter:
        return self.meters[k]

    def averages(self) -> dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}

    def local_averages(self) -> dict[str, float]:
        return {k: m.local_avg for k, m in self.meters.items()}


def topk_accuracy_np(scores: np.ndarray, targets: np.ndarray,
                     ks: Iterable[int] = (1, 5)) -> dict[str, float]:
    """Host-side top-k (``calc_topk_accuracy``, ``utils/utils.py:38``)."""
    order = np.argsort(-scores, axis=1)
    out = {}
    for k in ks:
        hit = (order[:, :k] == targets[:, None]).any(axis=1)
        out[f"top{k}"] = float(hit.mean())
    return out


def accuracy_np(scores: np.ndarray, targets: np.ndarray) -> float:
    """Plain argmax accuracy (``calc_accuracy``, ``utils/utils.py:57``)."""
    return float((scores.argmax(axis=1) == targets.reshape(-1)).mean())


def accuracy_binary_np(scores: np.ndarray, targets: np.ndarray) -> float:
    """Sigmoid-threshold binary accuracy (``calc_accuracy_binary``,
    ``utils/utils.py:63``): pred > 0 vs {0, 1} targets."""
    return float(((scores > 0).astype(np.int64)
                  == targets.reshape(scores.shape)).mean())


class AccuracyTable:
    """Per-class accuracy (``utils/utils.py:116-137``)."""

    def __init__(self):
        self.dict: dict[int, dict[str, int]] = {}

    def update(self, pred: np.ndarray, target: np.ndarray) -> None:
        for p, t in zip(np.asarray(pred).flatten(),
                        np.asarray(target).flatten()):
            t = int(t)
            entry = self.dict.setdefault(t, {"count": 0, "correct": 0})
            entry["count"] += 1
            if int(p) == t:
                entry["correct"] += 1

    def print_table(self, label: str = "") -> None:
        for key in sorted(self.dict):
            e = self.dict[key]
            acc = e["correct"] / e["count"]
            print(f"{label}: {key:3d}: {e['count']:5d}: {acc:.3f}")


class ConfusionMeter:
    """Confusion matrix + SVG plot (``utils/utils.py:140-193``)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.mat = np.zeros((num_classes, num_classes), np.int64)

    def update(self, pred: np.ndarray, target: np.ndarray) -> None:
        for p, t in zip(np.asarray(pred).flatten(),
                        np.asarray(target).flatten()):
            self.mat[int(p), int(t)] += 1

    def print_mat(self) -> None:
        print("Confusion Matrix (target in columns):")
        print(self.mat)

    def plot_mat(self, path: str, dictionary: Optional[dict] = None,
                 annotate: bool = False) -> None:
        import matplotlib
        matplotlib.use("agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(dpi=600)
        im = ax.imshow(self.mat, cmap=plt.cm.jet, interpolation=None,
                       extent=(0.5, self.num_classes + 0.5,
                               self.num_classes + 0.5, 0.5))
        if annotate:
            for i in range(self.mat.shape[0]):
                for j in range(self.mat.shape[1]):
                    ax.annotate(str(self.mat[i, j]),
                                xy=(j + 1, i + 1), fontsize=8,
                                ha="center", va="center")
        if dictionary is not None:
            ticks = [dictionary[i] for i in range(self.num_classes)]
            ax.set_xticks(np.arange(self.num_classes) + 1)
            ax.set_xticklabels(ticks, fontsize=2, rotation=90)
            ax.set_yticks(np.arange(self.num_classes) + 1)
            ax.set_yticklabels(ticks, fontsize=2)
        ax.set_xlabel("Ground Truth")
        ax.set_ylabel("Prediction")
        fig.colorbar(im)
        plt.tight_layout()
        plt.savefig(path, format="svg")
        plt.clf()
        plt.close(fig)


def denormalize(frames: np.ndarray) -> np.ndarray:
    """Invert ImageNet normalisation for logging (``utils/utils.py:70-74``).
    frames: [..., H, W, 3] normalised → [0, 1] clipped."""
    return np.clip(frames * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)


def write_log(content: str, epoch: int, filename: str) -> None:
    """Append a markdown log entry (``utils/utils.py:28-36``)."""
    import os
    mode = "a" if os.path.exists(filename) else "w"
    with open(filename, mode) as f:
        f.write(f"## Epoch {epoch}:\n")
        f.write(f"time: {__import__('time').ctime()}\n")
        f.write(content + "\n\n")
