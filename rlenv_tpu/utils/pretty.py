"""Console reporters for interactive runs.

Emits the exact stdout format the reference's log helpers produce
(`/root/reference/plantos_utils.py:5-39`, including its "Thirsty Spiders"
label quirk) so transcripts stay diffable, but is organised as one
table-driven formatter instead of four hand-rolled print blocks.
"""

from __future__ import annotations

from typing import Callable, Iterable

# Each row: (keys that must all be present in the info dict, line template
# rendered with those values). Order matches the reference output order.
_INFO_FIELDS: tuple[tuple[tuple[str, ...], Callable[..., str]], ...] = (
    (("rover_position",),
     lambda pos: f"Rover Position: {pos}"),
    (("thirsty_plants", "total_plants"),
     lambda thirsty, total: f"Thirsty Spiders: {thirsty} / {total}"),
    (("exploration_percentage", "explored_cells", "total_cells"),
     lambda pct, seen, total:
     f"Exploration: {float(pct):.1f}% ({seen} / {total} cells)"),
)


def _info_lines(info: dict) -> Iterable[str]:
    for keys, template in _INFO_FIELDS:
        if all(k in info for k in keys):
            yield template(*(info[k] for k in keys))


def print_info_dict(info: dict) -> None:
    """Readable info-dict dump (`plantos_utils.py:22-31`)."""
    for line in _info_lines(info):
        print(line)


def _banner_block(header: str, footer: str, info: dict,
                  lead: str = "") -> None:
    print(lead + header)
    print_info_dict(info)
    print(footer)


def print_step_info(step: int, action: int, reward: float,
                    info: dict) -> None:
    """Single-step report (`plantos_utils.py:5-11`)."""
    print("-" * 20 + f" Step {step} " + "-" * 20)
    print(f"Action: {action}")
    print(f"Reward: {reward:.2f}")
    print_info_dict(info)
    print("-" * (48 + len(str(step))))


def print_reset_info(info: dict, initial: bool = True) -> None:
    """Reset report (`plantos_utils.py:14-19`)."""
    title = " Initial State " if initial else " Environment Reset "
    _banner_block("=" * 20 + title + "=" * 20,
                  "=" * (40 + len(title)), info)


def print_episode_summary(step: int, info: dict) -> None:
    """End-of-episode summary (`plantos_utils.py:34-39`)."""
    _banner_block("#" * 20 + " Episode Finished " + "#" * 20 +
                  f"\nFinished at step {step}.",
                  "#" * 60 + "\n", info, lead="\n")
