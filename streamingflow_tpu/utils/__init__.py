from .network import pack_sequence_dim, preprocess_batch, unpack_sequence_dim
