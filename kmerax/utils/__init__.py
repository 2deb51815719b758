from kmerax.utils.logging import get_logger
from kmerax.utils.metrics import MetricsWriter
