from .upload import upload_groups  # noqa: F401
