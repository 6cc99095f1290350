from .vae import VAE, Encoder, Decoder  # noqa: F401
