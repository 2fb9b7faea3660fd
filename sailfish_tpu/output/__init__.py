from .writers import QuantWriter  # noqa: F401
from .genemap import TranscriptGeneMap, generate_gene_level_estimates  # noqa: F401
