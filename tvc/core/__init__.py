from tvc.core import consistency, similarity  # noqa: F401
