from morphik_core_tpu.storage.base_storage import BaseStorage  # noqa: F401
from morphik_core_tpu.storage.local_storage import LocalStorage  # noqa: F401
from morphik_core_tpu.storage.content_types import detect_content_type, is_colpali_native_format  # noqa: F401
