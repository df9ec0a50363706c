"""CASFilter: AMD contrast-adaptive sharpening as a chain filter.

Reference parity: the OBS plugin's CAS filter (reference Modules/OBS-Plugin/
Sources/Enhancement/CASFilter.cpp + Effects/CASEffect.cpp:62-90: `CasSetup`
with sharpness only, scaling terms unused) — a sharpen-only enhancement
filter, distinct from the FSR/RCAS pair in ScalingFilter (the reference
registers them as separate OBS sources, Module.cpp).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from livevisionkit_tpu.config import CASFilterSettings
from livevisionkit_tpu.data.frame import Frame
from livevisionkit_tpu.filters.base import VideoFilter
from livevisionkit_tpu.ops import cas as cas_ops


@dataclass(frozen=True)
class CASFilter(VideoFilter):
    settings: CASFilterSettings = field(default_factory=CASFilterSettings)

    def step(self, state: Any, frame: Frame, *, drain: bool = False) -> tuple[Any, Frame]:
        return state, frame.with_pixels(
            cas_ops.cas(frame.pixels, self.settings.sharpness)
        )
