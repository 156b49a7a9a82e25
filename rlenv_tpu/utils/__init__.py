from rlenv_tpu.utils.pretty import (
    print_episode_summary,
    print_info_dict,
    print_reset_info,
    print_step_info,
)

__all__ = ["print_step_info", "print_reset_info", "print_info_dict",
           "print_episode_summary"]
