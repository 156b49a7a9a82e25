"""Learning-curve plotting.

Parity with the reference's matplotlib outputs:

* :func:`plot_learning_curve` — two-panel reward/episode-length figure with
  moving-average smoothing, reading monitor CSVs
  (`/root/reference/trainingCode.py:328-377`, duplicated at
  `A2C_training.py:298-353`).
* :func:`visualise_training_logs` — smoothed single-metric plot from a
  ``progress.csv`` (`/root/reference/training_utils.py:23-45`).

matplotlib uses the Agg backend (headless)."""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np


def _load_monitor_csvs(log_dir: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load all ``*.monitor.csv`` under log_dir -> (timesteps, r, l) sorted
    by wall time (the SB3 load_results/ts2xy pipeline, minimally)."""
    rows = []
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".monitor.csv"):
            continue
        path = os.path.join(log_dir, name)
        with open(path) as f:
            header = f.readline()
            if header.startswith("#"):
                json.loads(header[1:])  # validate
            cols = f.readline().strip().split(",")
            for line in f:
                parts = line.strip().split(",")
                if len(parts) < 3:
                    continue
                rec = dict(zip(cols, parts))
                rows.append((float(rec["t"]), float(rec["r"]),
                             int(float(rec["l"]))))
    if not rows:
        return np.array([]), np.array([]), np.array([])
    rows.sort(key=lambda x: x[0])
    t = np.array([r[0] for r in rows])
    rew = np.array([r[1] for r in rows])
    length = np.array([r[2] for r in rows])
    timesteps = np.cumsum(length)
    return timesteps, rew, length


def plot_learning_curve(log_dir: str, title: str = "Learning Curve",
                        out_path: Optional[str] = None) -> Optional[str]:
    """Reward + episode-length panels with moving-average smoothing
    (`trainingCode.py:328-377`). Returns the written PNG path or None."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x, y, lengths = _load_monitor_csvs(log_dir)
    if len(y) == 0:
        print("No results to plot yet.")
        return None

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(15, 5))
    ax1.plot(x, y, alpha=0.3, color="blue", label="Raw Reward")
    if len(y) > 100:
        window = min(100, len(y) // 10)
        smoothed = np.convolve(y, np.ones(window) / window, mode="valid")
        ax1.plot(x[:len(smoothed)], smoothed, color="red", linewidth=2,
                 label="Smoothed Reward")
    ax1.set_xlabel("Timesteps")
    ax1.set_ylabel("Episode Reward")
    ax1.set_title(title)
    ax1.legend()
    ax1.grid(True, alpha=0.3)

    ax2.plot(x, lengths, alpha=0.3, color="green")
    if len(lengths) > 100:
        window = min(100, len(lengths) // 10)
        smoothed = np.convolve(lengths, np.ones(window) / window,
                               mode="valid")
        ax2.plot(x[:len(smoothed)], smoothed, color="orange", linewidth=2)
    ax2.set_xlabel("Timesteps")
    ax2.set_ylabel("Episode Length")
    ax2.set_title("Episode Length Over Time")
    ax2.grid(True, alpha=0.3)

    plt.tight_layout()
    out_path = out_path or os.path.join(log_dir, "learning_curve.png")
    plt.savefig(out_path, dpi=150)
    plt.close(fig)
    print(f"Learning curve saved to: {out_path}")
    return out_path


def visualise_training_logs(metric_name: str, title: str,
                            log_dir: str) -> Optional[str]:
    """Smoothed metric-vs-timesteps plot from progress.csv
    (`training_utils.py:23-45`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    log_file = os.path.join(log_dir, "progress.csv")
    df = pd.read_csv(log_file)
    window = 50
    values = df[metric_name].dropna()
    timesteps = df["time/total_timesteps"].iloc[-len(values):]
    if len(values) < window:
        window = max(1, len(values) // 2)
    smoothed = np.convolve(values, np.ones(window) / window, mode="valid")
    timesteps = timesteps.iloc[-len(smoothed):]

    plt.figure(figsize=(10, 6))
    plt.plot(np.asarray(timesteps) / 1e6, smoothed, color="deepskyblue",
             linewidth=2)
    plt.xlabel("Number of Timesteps (millions)")
    plt.ylabel(title)
    plt.title(f"{title} vs Timesteps Smoothed")
    plt.grid(True)
    out = os.path.join(log_dir, f"{title}_smoothed.png")
    plt.savefig(out, dpi=150, bbox_inches="tight")
    plt.close()
    print(f"Plot saved to {out}")
    return out
