from . import fusion, mae, mil  # noqa: F401
