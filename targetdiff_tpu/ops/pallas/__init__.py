from .edge_layer import h2x_attention_layer, x2h_attention_layer  # noqa: F401
