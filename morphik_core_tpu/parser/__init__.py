from morphik_core_tpu.parser.morphik_parser import MorphikParser  # noqa: F401
from morphik_core_tpu.parser.text_splitter import RecursiveCharacterTextSplitter  # noqa: F401
