"""Round-3 driver features: live training-log semantics and eval-driven
best-model capture.

Covers the metrics semantics the round-2/3 reviews flagged
(`train/metrics.py`): (a) "Mazes completed" always uses the reference
callback's definition — episodes ending >=100% explored
(`trainingCode.py:300-318`) — via the device-side monotonic counter
(``EpisodeStats.full_exploration_count``, immune to ring overflow), while
the curriculum's threshold-success total gets its own separate line;
(b) eval windows with no newly finished episodes must not re-log
the same ring entries as fresh. Plus the SB3
``EvalCallback(best_model_save_path=...)`` pattern
(`/root/reference/trainingCode.py:188-194`): periodic deterministic eval
saving ``models/best_model`` whenever mean eval return improves.
"""

import os

import jax.numpy as jnp
import numpy as np

from rlenv_tpu.algos.common import EpisodeStats
from rlenv_tpu.config import A2CConfig, CurriculumConfig, EnvConfig
from rlenv_tpu.train.metrics import TrainingLogWriter


def _stats_with_episodes(n_envs=4, episodes=None, pos=0):
    stats = EpisodeStats.init(n_envs, log_capacity=16)
    if episodes:
        expl = np.zeros(16, np.float32)
        for i, e in enumerate(episodes):
            expl[(pos + i) % 16] = e
        stats = stats.replace(
            log_exploration=jnp.asarray(expl),
            log_pos=jnp.int32(pos + len(episodes)),
            full_exploration_count=jnp.int32(
                sum(1 for e in episodes if e >= 100.0)))
    return stats


def test_training_log_skips_windows_without_new_episodes(tmp_path):
    w = TrainingLogWriter(str(tmp_path), eval_freq=10)
    stats = _stats_with_episodes(episodes=[50.0, 60.0])
    w.maybe_log(10, stats)
    lines_after_first = open(w.path).read().count("Mean Exploration")
    assert lines_after_first == 1

    # Same ring state, later step: must NOT re-log the stale window.
    w.maybe_log(20, stats)
    assert open(w.path).read().count("Mean Exploration") == 1

    # A new episode arrives -> logging resumes with only fresh data.
    stats2 = _stats_with_episodes(episodes=[50.0, 60.0, 80.0])
    w.maybe_log(30, stats2)
    content = open(w.path).read()
    assert content.count("Mean Exploration") == 2
    assert "80.00%" in content  # newest-10 window mean of [50,60,80]? no:
    # the second line covers only episode(s) since the last drain = [80.0]


def test_training_log_separates_curriculum_successes(tmp_path):
    """'Mazes completed' keeps the >=100%-episode definition even with a
    curriculum active; threshold successes get their own line."""
    w = TrainingLogWriter(str(tmp_path), eval_freq=10)
    stats = _stats_with_episodes(episodes=[100.0, 55.0])
    w.maybe_log(10, stats, curriculum_successes=7)
    content = open(w.path).read()
    assert "Mazes completed: 1" in content
    assert "Curriculum threshold successes: 7" in content
    stats2 = _stats_with_episodes(episodes=[100.0, 55.0, 100.0])
    w.maybe_log(20, stats2, curriculum_successes=9)
    content = open(w.path).read()
    assert "Mazes completed: 2" in content
    assert "Curriculum threshold successes: 9" in content


def test_training_log_counts_full_exploration(tmp_path):
    w = TrainingLogWriter(str(tmp_path), eval_freq=10)
    stats = _stats_with_episodes(episodes=[100.0, 40.0, 100.0])
    w.maybe_log(10, stats)  # no curriculum counter provided
    content = open(w.path).read()
    assert "Mazes completed: 2" in content
    assert "Curriculum threshold successes" not in content


def test_full_exploration_counter_on_device():
    """EpisodeStats.update counts >=100% episode ends monotonically,
    regardless of ring capacity."""
    stats = EpisodeStats.init(3, log_capacity=2)  # ring smaller than batch
    done = jnp.array([True, True, True])
    expl = jnp.array([100.0, 99.9, 100.0])
    stats = stats.update(jnp.zeros(3), done, expl)
    assert int(stats.full_exploration_count) == 2
    stats = stats.update(jnp.zeros(3), done, expl)
    assert int(stats.full_exploration_count) == 4


def test_train_saves_best_model_on_eval(tmp_path):
    """train(eval_interval=...) writes models/best_model with metadata."""
    from rlenv_tpu.train.trainer import train

    env_config = EnvConfig(grid_size=7, num_plants=2, num_obstacles=3,
                           lidar_range=2, lidar_channels=4, max_steps=20)
    log_dir = str(tmp_path / "run")
    state, result = train(
        algo="a2c", total_timesteps=8 * 2 * 12, n_envs=8,
        env_config=env_config,
        algo_config=A2CConfig(hidden_sizes=(16,), n_steps=2),
        log_dir=log_dir, seed=0, iterations_per_chunk=4,
        eval_interval=64, n_eval_episodes=4,
        plot=False, verbose=False)
    best = os.path.join(log_dir, "models", "best_model")
    assert os.path.exists(best), "best_model checkpoint written"
    import json
    meta = json.load(open(best + ".meta.json"))
    assert meta["model_type"] == "a2c"
    assert "eval_mean_return" in meta and np.isfinite(meta["eval_mean_return"])
    assert meta["timesteps"] > 0


def test_train_without_eval_interval_tolerates_overshoot(tmp_path):
    """Regression: when the last chunk overshoots total_timesteps and no
    eval_interval is set, the eval hook must stay inert (it crashed with
    `int += None` on the overshoot)."""
    from rlenv_tpu.train.trainer import train

    env_config = EnvConfig(grid_size=5, num_plants=1, num_obstacles=0,
                           lidar_range=2, lidar_channels=4, max_steps=8)
    _, result = train(
        algo="a2c", total_timesteps=100,  # chunk = 4*2*8 = 64 -> 128 > 101
        n_envs=8, env_config=env_config,
        algo_config=A2CConfig(hidden_sizes=(16,), n_steps=2),
        log_dir=str(tmp_path / "run"), seed=0, iterations_per_chunk=4,
        plot=False, verbose=False)
    assert result.timesteps >= 100


def test_train_curriculum_logs_maze_completions(tmp_path):
    """End-to-end: a curriculum run's training_log keeps 'Mazes completed'
    on the reference's >=100%-episode definition AND surfaces the
    curriculum's device-side threshold-success counter on its own line."""
    from rlenv_tpu.train.trainer import train

    env_config = EnvConfig(grid_size=5, num_plants=1, num_obstacles=0,
                           lidar_range=2, lidar_channels=4, max_steps=8)
    # threshold 1%: reached immediately -> successes accumulate
    state, result = train(
        algo="a2c", total_timesteps=8 * 2 * 8, n_envs=8,
        use_curriculum=True,
        curriculum_config=CurriculumConfig(
            initial_threshold=1.0, threshold_increment=0.0,
            max_threshold=1.0),
        env_config=env_config,
        algo_config=A2CConfig(hidden_sizes=(16,), n_steps=2),
        log_dir=str(tmp_path / "run"), seed=0, iterations_per_chunk=4,
        eval_freq=1, plot=False, verbose=False)
    content = open(os.path.join(
        str(tmp_path / "run"), "training_log.txt")).read()
    counts = [int(line.split(":")[1]) for line in content.splitlines()
              if line.startswith("Mazes completed")]
    assert counts, "training log has maze-completion lines"
    # 1%-threshold successes are NOT full explorations: the reference
    # definition must not inflate.
    assert all(c == 0 for c in counts), f"expected no 100% episodes, {counts}"
    successes = [int(line.split(":")[1]) for line in content.splitlines()
                 if line.startswith("Curriculum threshold successes")]
    assert successes and successes[-1] > 0, \
        f"device successes surfaced, got {successes}"
