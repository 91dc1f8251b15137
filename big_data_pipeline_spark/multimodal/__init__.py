from big_data_pipeline_spark.multimodal.columns import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_fake_media,
    attach_ppm_media,
    byte_histogram_features,
    decode_image,
    decode_netpbm,
    decoded_pixel_features,
    frame_sample,
    resize_image,
)
