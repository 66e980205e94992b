"""Shared codec exception types (leaf module — imports nothing from
the package, so every codec module can depend on it)."""

__all__ = ["DimensionMismatchError"]


class DimensionMismatchError(ValueError):
    """The stream's own header dims disagree with the table metadata.

    Raised BEFORE any header-sized allocation by every decoder (PNG
    IHDR, BMP DIB, GIF logical screen, TIFF IFD, JPEG SOF, WEBP VP8L
    header): stream dim fields are 14-16 bits, so a handful of
    corrupt bytes can otherwise demand a multi-GB buffer — at 10^12-
    image ingest scale that is an executor OOM, not an errors-as-data
    row. Semantically this is a METADATA defect in an otherwise
    decodable file, so validate_images routes it to the
    DimensionMismatch tier, apart from CorruptStream (malformed
    bytes) and CodecUnavailable (valid-but-declined variants).
    Subclasses ValueError so callers that treat decode failures
    generically keep working.
    """
