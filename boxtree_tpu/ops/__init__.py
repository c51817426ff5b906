from boxtree_tpu import config  # noqa: F401  (enables 64-bit mode)
