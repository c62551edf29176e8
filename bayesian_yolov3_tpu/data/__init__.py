from .encode import PriorTables, encode_boxes, build_prior_tables  # noqa: F401
