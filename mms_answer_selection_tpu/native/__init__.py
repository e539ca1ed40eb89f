from .packed_format import write_mmsp, PackedStore, NativePrefetcher  # noqa: F401
