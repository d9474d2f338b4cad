from .png import read_png, write_png  # noqa: F401
