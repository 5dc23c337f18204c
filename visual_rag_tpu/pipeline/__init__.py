"""Ingest pipeline: PDF -> images -> crop -> embed -> pooling fan-out -> index."""

from visual_rag_tpu.pipeline.crop_empty import CropEmptyConfig, crop_empty  # noqa: F401
from visual_rag_tpu.pipeline.pdf_processor import PDFProcessor  # noqa: F401
from visual_rag_tpu.pipeline.pipeline import ProcessingPipeline  # noqa: F401
from visual_rag_tpu.pipeline.uploader import CloudinaryUploader, LocalImageStore  # noqa: F401
