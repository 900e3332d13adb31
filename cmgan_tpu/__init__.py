"""cmgan-tpu: a TPU-native speech-enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CMGAN
(conformer-based metric GAN for monaural time-frequency speech
enhancement). See SURVEY.md for the structural map of the reference and
BASELINE.md for the numbers this framework targets.
"""

from cmgan_tpu.config import (
    CMGANConfig,
    DSPConfig,
    EvalConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)

__version__ = "0.1.0"

__all__ = [
    "CMGANConfig",
    "DSPConfig",
    "EvalConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
]
