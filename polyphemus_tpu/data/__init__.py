from .dataset import PolyphemusDataset, BatchLoader, load_sample  # noqa: F401
