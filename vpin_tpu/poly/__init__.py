from .dense import (
    DensePoly, eq_evals, eq_eval_single, factored_lens,
    ints_to_dev, dev_to_ints,
)

__all__ = [
    "DensePoly", "eq_evals", "eq_eval_single", "factored_lens",
    "ints_to_dev", "dev_to_ints",
]
