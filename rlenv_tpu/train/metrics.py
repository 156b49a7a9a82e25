"""Host-side metrics: Monitor CSVs, training log, TensorBoard.

Parity targets:

* SB3 ``Monitor`` per-env CSVs with a JSON header line and ``r,l,t`` rows
  (`/root/reference/train_improved1/gym/env_0.monitor.csv`, produced by
  `trainingCode.py:109`). Here one writer drains the device-side episode
  ring log (:class:`rlenv_tpu.algos.common.EpisodeStats`) after each jitted
  chunk — per-episode fidelity without a host round-trip per step.
* ``training_log.txt`` appender mirroring ``EvaluationCallback``
  (`trainingCode.py:289-323`). The reference's version is a no-op (it reads
  an ``'exploration_percentage'`` key that Monitor never records —
  SURVEY.md §5); ours logs real exploration because the env ships it in the
  episode ring log. Format kept identical.
* optional TensorBoard scalars via ``tensorboardX`` (mirrors the
  ``tensorboard_log=`` dirs, `trainingCode.py:154`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

from rlenv_tpu.algos.common import EpisodeStats


class MonitorWriter:
    """Writes SB3-Monitor-format episode CSVs from drained EpisodeStats.

    The reference writes one CSV per env (``env_{rank}.monitor.csv``); with
    thousands of device envs we write a single combined file by default
    (``env_all.monitor.csv``) in the same row format, which every SB3-style
    results loader can parse.
    """

    HEADER_KEYS = ("r", "l", "t")

    def __init__(self, log_dir: str, filename: str = "env_all.monitor.csv",
                 extra_keys: tuple = ("exploration", "env"),
                 per_env_files: int = 0, append: bool = False):
        """``per_env_files=N`` additionally writes reference-style
        ``env_{rank}.monitor.csv`` shards for the first N envs.
        ``append=True`` keeps an existing CSV's rows (checkpoint-resumed
        training continues the same episode log instead of truncating
        it)."""
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.path = os.path.join(log_dir, filename)
        self.t_start = time.time()
        self._drained = 0
        self._extra = extra_keys
        self.per_env_files = per_env_files
        self._header = ("#" + json.dumps(
            {"t_start": self.t_start, "env_id": "PlantOS-v0"}) + "\n"
            + ",".join(self.HEADER_KEYS + tuple(extra_keys)) + "\n")
        if not (append and os.path.exists(self.path)):
            with open(self.path, "w") as f:
                f.write(self._header)
        self._env_files_created: set = set()

    def _env_path(self, rank: int) -> str:
        return os.path.join(self.log_dir, f"env_{rank}.monitor.csv")

    def mark_drained(self, pos: int) -> None:
        """Treat episodes up to ring position ``pos`` as already written
        (checkpoint resume: the restored stats ring holds pre-resume
        episodes the previous process logged)."""
        self._drained = pos

    def drain(self, stats: EpisodeStats) -> Dict[str, float]:
        """Append episodes finished since the last drain; returns summary."""
        pos = int(stats.log_pos)
        K = stats.log_return.shape[0]
        new = pos - self._drained
        if new <= 0:
            return {}
        if new > K:  # ring overflowed between drains; keep the newest K
            self._drained = pos - K
            new = K
        idx = (np.arange(self._drained, pos) % K)
        rs = np.asarray(stats.log_return)[idx]
        ls = np.asarray(stats.log_length)[idx]
        es = np.asarray(stats.log_exploration)[idx]
        envs = np.asarray(stats.log_env)[idx]
        now = round(time.time() - self.t_start, 6)
        with open(self.path, "a") as f:
            for r, l, e, n in zip(rs, ls, es, envs):
                f.write(f"{round(float(r), 6)},{int(l)},{now},"
                        f"{round(float(e), 4)},{int(n)}\n")
        if self.per_env_files:
            for r, l, e, n in zip(rs, ls, es, envs):
                rank = int(n)
                if rank >= self.per_env_files:
                    continue
                path = self._env_path(rank)
                if rank not in self._env_files_created:
                    with open(path, "w") as f:
                        f.write(self._header)
                    self._env_files_created.add(rank)
                with open(path, "a") as f:
                    f.write(f"{round(float(r), 6)},{int(l)},{now},"
                            f"{round(float(e), 4)},{rank}\n")
        self._drained = pos
        return {
            "episodes": new,
            "mean_return": float(rs.mean()),
            "mean_length": float(ls.mean()),
            "mean_exploration": float(es.mean()),
        }


class TrainingLogWriter:
    """`training_log.txt` appender, format-compatible with the reference's
    EvaluationCallback (`trainingCode.py:316-318`) — but actually live."""

    def __init__(self, log_dir: str, eval_freq: int = 10_000):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "training_log.txt")
        self.eval_freq = eval_freq
        self._last_logged = 0
        self._drained = 0          # episodes consumed from the ring log
        self.best_mean_exploration = 0.0
        self.maze_completion_count = 0

    def maybe_log(self, timesteps: int, stats: EpisodeStats,
                  curriculum_successes: Optional[int] = None) -> None:
        """Append one eval line if due AND new episodes finished.

        ``Mazes completed`` always uses the reference callback's definition
        — episodes that ended with exploration >= 100%
        (`trainingCode.py:300-318`) — read from the device-side monotonic
        counter (``EpisodeStats.full_exploration_count``), so it can't
        undercount when more episodes finish between drains than the ring
        holds. ``curriculum_successes`` (the curriculum's threshold-success
        total, ``CurriculumState.successful_explorations`` — a different,
        much larger quantity since thresholds start at 30%) is logged on
        its own separate line when provided. Windows with no NEW episodes
        are skipped entirely, so the log never repeats frozen values as
        fresh.
        """
        if timesteps - self._last_logged < self.eval_freq:
            return
        pos = int(stats.log_pos)
        new = pos - self._drained
        if new <= 0:
            return                  # nothing new — don't re-log stale values
        self._last_logged = timesteps
        K = stats.log_return.shape[0]
        take = min(new, K, 10)      # mean over the newest <=10 fresh episodes
        idx = (np.arange(pos - take, pos) % K)
        explorations = np.asarray(stats.log_exploration)[idx]
        self.maze_completion_count = int(stats.full_exploration_count)
        self._drained = pos
        mean_exploration = float(explorations.mean())
        with open(self.path, "a") as f:
            f.write(f"[Step {timesteps}] Mean Exploration: "
                    f"{mean_exploration:.2f}%\n")
            f.write(f"Mazes completed: {self.maze_completion_count}\n")
            if curriculum_successes is not None:
                f.write(f"Curriculum threshold successes: "
                        f"{int(curriculum_successes)}\n")
        if mean_exploration > self.best_mean_exploration:
            self.best_mean_exploration = mean_exploration


class TensorBoardWriter:
    """Thin tensorboardX wrapper; becomes a no-op if unavailable."""

    def __init__(self, log_dir: Optional[str]):
        self._writer = None
        if log_dir is None:
            return
        try:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(log_dir)
        except Exception:
            self._writer = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        if self._writer is None:
            return
        for k, v in values.items():
            self._writer.add_scalar(k, v, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
