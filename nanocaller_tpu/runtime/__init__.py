"""Host-side runtime: region planning, chunk scheduling, distributed setup."""

from .chunker import get_regions_list, get_chunks
