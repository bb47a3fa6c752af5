from .synthetic import make_batch, tiny_config
