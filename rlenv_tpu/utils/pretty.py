"""Console pretty-printers.

Format parity with `/root/reference/plantos_utils.py:5-39` (including its
"Thirsty Spiders" label quirk, kept verbatim for output compatibility)."""

from __future__ import annotations


def print_step_info(step: int, action: int, reward: float, info: dict):
    """Formatted single-step report (`plantos_utils.py:5-11`)."""
    print("-" * 20 + f" Step {step} " + "-" * 20)
    print(f"Action: {action}")
    print(f"Reward: {reward:.2f}")
    print_info_dict(info)
    print("-" * (48 + len(str(step))))


def print_reset_info(info: dict, initial: bool = True):
    """Formatted reset report (`plantos_utils.py:14-19`)."""
    title = " Initial State " if initial else " Environment Reset "
    print("=" * 20 + title + "=" * 20)
    print_info_dict(info)
    print("=" * (40 + len(title)))


def print_info_dict(info: dict):
    """Readable info-dict dump (`plantos_utils.py:22-31`)."""
    if "rover_position" in info:
        print(f"Rover Position: {info['rover_position']}")
    if "thirsty_plants" in info and "total_plants" in info:
        print(f"Thirsty Spiders: {info['thirsty_plants']} / "
              f"{info['total_plants']}")
    if ("exploration_percentage" in info and "explored_cells" in info
            and "total_cells" in info):
        exploration_perc = float(info["exploration_percentage"])
        print(f"Exploration: {exploration_perc:.1f}% "
              f"({info['explored_cells']} / {info['total_cells']} cells)")


def print_episode_summary(step: int, info: dict):
    """End-of-episode summary (`plantos_utils.py:34-39`)."""
    print("\n" + "#" * 20 + " Episode Finished " + "#" * 20)
    print(f"Finished at step {step}.")
    print_info_dict(info)
    print("#" * 60 + "\n")
