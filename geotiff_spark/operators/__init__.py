"""DataFrame-level operators: extraction, cell encode, joins, sampling."""
