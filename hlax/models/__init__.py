from hlax.models.hlvae import HLVAE, HLVAEConfig, nll_from_log_p  # noqa: F401
