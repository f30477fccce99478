"""Host-side sample transforms (NumPy), parity with reference
``enflow/data/transforms.py:10-88``.

Transforms operate on ``Sample`` objects (see ``datasets.py``) during dataset
construction — they run once per frame on the host; the device-side pipeline
only ever sees reduced-unit padded arrays.
"""

from __future__ import annotations

import numpy as np

from ..utils.conversion import dist_to_lj, vel_to_lj


class NoneTransform:
    def __call__(self, sample):
        return sample


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class ConvertPositionsFrom:
    """Convert positions/box/r_cut from a lab distance unit to reduced units
    (reference transforms.py:26-34)."""

    def __init__(self, input_unit):
        self.input_unit = input_unit

    def __call__(self, sample):
        sample.pos = dist_to_lj(sample.pos, self.input_unit)
        sample.box = dist_to_lj(sample.box, self.input_unit)
        sample.r_cut = dist_to_lj(sample.r_cut, self.input_unit)
        return sample


class ConvertVelocitiesFrom:
    """Reference transforms.py:36-43 (with the femto-unit fix, see
    ``utils/conversion.py``)."""

    def __init__(self, input_unit1, input_unit2):
        self.input_unit1 = input_unit1
        self.input_unit2 = input_unit2

    def __call__(self, sample):
        sample.vel = vel_to_lj(sample.vel, self.input_unit1, self.input_unit2)
        return sample


class Center:
    """Zero the mean position (reference transforms.py:45-52)."""

    def __call__(self, sample):
        sample.pos = sample.pos - sample.pos.mean(axis=0, keepdims=True)
        return sample


class RandomizeVelocity:
    """Draw Maxwell-Boltzmann velocities at temperature ``kBT`` (reduced).

    The reference numerically inverts the MB *speed* CDF on a grid and draws
    uniform sphere angles (transforms.py:54-88, mass hardcoded to 1). That is
    exactly the distribution of a 3-vector of i.i.d. normals with std
    ``sqrt(kBT/m)``, so we sample that directly (no SciPy interpolation
    artifacts). Mass = 1 kept for parity (transforms.py:64 TODO).
    """

    def __init__(self, kBT, seed=None):
        self.kBT = kBT
        self.rng = np.random.default_rng(seed)

    def __call__(self, sample):
        std = np.sqrt(self.kBT)
        sample.vel = self.rng.normal(0.0, std, size=sample.pos.shape)
        return sample
