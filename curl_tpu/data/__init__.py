"""Data pipeline (L3 of the framework)."""

from curl_tpu.data.augment import augment_batch, rotate_nearest  # noqa: F401
from curl_tpu.data.dataset import (  # noqa: F401
    Record,
    crop_pair,
    load_example,
    load_image,
    read_split_ids,
    scan_data_dir,
    select_records,
)
from curl_tpu.data.pipeline import Loader, prefetch, shard_batch  # noqa: F401
