"""dpc_tpu — a TPU-native Dense Predictive Coding framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of TengdaHan/DPC
(Han, Xie, Zisserman: "Video Representation Learning by Dense Predictive
Coding", ICCV-W 2019): self-supervised video representation pretraining with
a 2D-3D ResNet backbone, a ConvGRU temporal aggregator, an autoregressive
future-prediction head, and a dense spatio-temporal InfoNCE objective —
plus the downstream supervised action-classification path (finetune /
linear-probe / dense test-time evaluation).

Everything in the compute path is functional JAX: pure ``init``/``apply``
functions over explicit parameter pytrees, one jitted train step, sharding
via ``jax.sharding.Mesh`` + ``shard_map`` (data parallelism with
shard-local or global contrastive negative pools), and Pallas TPU kernels
for the hot recurrent/contrastive ops.
"""

__version__ = "0.1.0"

from dpc_tpu.core.config import DPCConfig, TrainConfig, EvalConfig, DataConfig  # noqa: F401
