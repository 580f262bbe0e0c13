"""Multi-process utilities.

The analog of the reference's MPI rank gating (`/root/reference/fedm/
utils.py:7-12`): on multi-host TPU pods, only process 0 prints/writes.
"""

from __future__ import annotations

from typing import List


def print_process_0(*args, **kwargs) -> None:
    try:
        import jax

        if jax.process_index() != 0:
            return
    except Exception:
        pass
    print(*args, **kwargs)


def comma_separated(strings: List[str]) -> str:
    return ", ".join(f"'{s}'" for s in strings)
