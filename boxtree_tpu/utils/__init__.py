from boxtree_tpu import config  # noqa: F401
