"""Import/export surfaces over the codec layer (SURVEY §2.1)."""

from .files import (  # noqa: F401
    export_collection_bytes,
    export_collection_stream,
    export_distributed,
    export_zip_archive,
    import_entries_bytes,
    import_files_df,
)
