from cmgan_tpu.models.conformer import ConformerBlock
from cmgan_tpu.models.discriminator import MetricDiscriminator
from cmgan_tpu.models.generator import TSCNet

__all__ = ["ConformerBlock", "MetricDiscriminator", "TSCNet"]
