"""Small host-side utilities shared across the library."""

from .misc import cdiv, next_fast_len, round_up_to_multiple
from .pytree import static_field, data_field, register_pytree_dataclass
from .besseli0 import besseli0
from .timer import Timer

__all__ = [
    "cdiv",
    "next_fast_len",
    "round_up_to_multiple",
    "static_field",
    "data_field",
    "register_pytree_dataclass",
    "besseli0",
    "Timer",
]
