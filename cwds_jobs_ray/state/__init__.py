from .manifest import Manifest, PartitionState  # noqa: F401
