from .batch import ComplexBatch, pad_complex, stack_complexes  # noqa: F401
