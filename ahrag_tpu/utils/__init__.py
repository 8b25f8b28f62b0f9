from ahrag_tpu.utils.config import load_config, set_nested
from ahrag_tpu.utils.logging import get_logger, SessionLogger
from ahrag_tpu.utils.tokens import count_tokens
