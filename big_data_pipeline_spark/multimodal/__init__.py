from big_data_pipeline_spark.multimodal.columns import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_fake_media,
    attach_gif_media,
    attach_jpeg_media,
    attach_png_media,
    attach_ppm_media,
    attach_wav_media,
    byte_histogram_features,
    decode_image,
    decode_netpbm,
    decode_png,
    decode_wav,
    decoded_audio_features,
    decoded_gif_stats,
    decoded_jpeg_stats,
    decoded_pixel_features,
    decoded_png_stats,
    encode_png,
    frame_sample,
    image_ahash,
    resize_image,
    resize_netpbm,
)
from big_data_pipeline_spark.multimodal.gif import (  # noqa: F401
    decode_gif,
    encode_gif,
)
from big_data_pipeline_spark.multimodal.jpeg import (  # noqa: F401
    decode_jpeg_baseline,
    encode_jpeg_baseline,
)
