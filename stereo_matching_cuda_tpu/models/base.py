"""Common interface for stereo matchers."""

from __future__ import annotations

import abc

import numpy as np

from ..config import StereoConfig, DEFAULT_CONFIG


class StereoMatcher(abc.ABC):
    """A stereo matcher: uint8 RGB pair in, disparity maps out.

    Subclasses implement ``_forward(left, right)`` returning the dict of
    device arrays; ``compute`` is the blocking numpy convenience.
    """

    def __init__(self, cfg: StereoConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    @abc.abstractmethod
    def _forward(self, left, right) -> dict:
        ...

    def compute(self, left: np.ndarray, right: np.ndarray) -> dict:
        out = self._forward(left, right)
        return {k: np.asarray(v) for k, v in out.items()}
