"""MonoPSR-TPU: a TPU-native JAX reimplementation of MonoPSR.

Monocular 3D Object Detection Leveraging Accurate Proposals and Shape
Reconstruction (Ku, Pon, Waslander, CVPR 2019), rebuilt from scratch for
TPU hardware: jit/pjit + Pallas compute path, fixed-shape batched host
pipeline, Orbax checkpoints.

Path helpers mirror the reference package-root helpers
(ref: src/monopsr/__init__.py:4-21) so every output location derives from
`data/outputs/<config_name>/...`.
"""

import os

__version__ = "0.1.0"


def root_dir():
    """Top-level directory of the monopsr_tpu package."""
    return os.path.dirname(os.path.abspath(__file__))


def top_dir():
    """Repository root (one level above the package)."""
    return os.path.dirname(root_dir())


def data_dir():
    """Data directory (detections, pretrained weights, outputs)."""
    return os.path.join(top_dir(), 'data')


def scripts_dir():
    """Scripts directory (offline eval, native tools)."""
    return os.path.join(top_dir(), 'scripts')
