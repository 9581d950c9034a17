"""Datasets: on-device synthetic generation and host-side real-data loaders."""
from sdfest_tpu.datasets.generated import SDFVAEViewDataset  # noqa: F401
