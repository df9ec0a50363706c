"""ScalingFilter: FSR upscale + RCAS sharpen.

Reference parity: ``lvk::ScalingFilter`` (reference Filters/ScalingFilter
.cpp:52-59): `lvk::upscale` (EASU, Functions/Image.cpp:101-160) followed by
`lvk::sharpen` (RCAS, Functions/Image.cpp:164-233); identity passthrough when
already at the output size.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

from livevisionkit_tpu.config import ScalingFilterSettings
from livevisionkit_tpu.data.frame import Frame
from livevisionkit_tpu.filters.base import FrameSpec, VideoFilter
from livevisionkit_tpu.ops import easu, rcas


@dataclass(frozen=True)
class ScalingFilter(VideoFilter):
    settings: ScalingFilterSettings = field(default_factory=ScalingFilterSettings)

    def step(self, state: Any, frame: Frame, *, drain: bool = False) -> tuple[Any, Frame]:
        s = self.settings
        px = frame.pixels
        if s.output_size is not None and frame.size != tuple(s.output_size):
            px = easu.easu_scale(px, tuple(s.output_size), fmt=frame.format)
        if s.sharpness > 0.0:
            px = rcas.rcas(px, s.sharpness)
        return state, frame.with_pixels(px)

    def output_spec(self, spec: FrameSpec) -> FrameSpec:
        if self.settings.output_size is None:
            return spec
        return dataclasses.replace(
            spec, height=self.settings.output_size[0], width=self.settings.output_size[1]
        )
