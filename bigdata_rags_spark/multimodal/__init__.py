"""Multimodal (image/audio/video-as-binary) column operators."""

from bigdata_rags_spark.multimodal.codecs import (
    attach_fake_image_payload,
    frame_sample,
    image_features,
    resize_images,
)

__all__ = [
    "attach_fake_image_payload",
    "frame_sample",
    "image_features",
    "resize_images",
]
