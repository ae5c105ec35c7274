from .build import make_optimizer, param_labels, warmup_multistep_schedule

__all__ = ["make_optimizer", "param_labels", "warmup_multistep_schedule"]
