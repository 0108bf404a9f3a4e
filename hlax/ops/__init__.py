from hlax.ops.normalization import batch_normalization, NormParams  # noqa: F401
from hlax.ops import likelihoods  # noqa: F401
