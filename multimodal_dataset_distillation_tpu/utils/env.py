"""One parser for the MDD_* boolean env overrides.

The perf-knob A/B overrides (MDD_FUSED_JVP, MDD_PALLAS_GCONV,
MDD_STEM_S2D) historically parsed booleans differently — two required
exactly "1" (so MDD_PALLAS_GCONV=true silently force-DISABLED the
kernel while the operator believed it was on, invalidating the A/B),
one accepted any non-falsy string.  All three now share these
semantics: unset/empty means "no override"; "0"/"false"/"no"/"off"
(any case) means False; anything else means True.
"""

from __future__ import annotations

import os
from typing import Optional

_FALSY = {"0", "false", "no", "off"}


def env_bool(name: str) -> Optional[bool]:
    """None when ``name`` is unset or empty, else its boolean value."""
    v = os.environ.get(name)
    if v is None or v == "":
        return None
    return v.strip().lower() not in _FALSY
