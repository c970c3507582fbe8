from morphik_core_tpu.completion.models import (  # noqa: F401
    BaseCompletionModel,
    OpenAICompatCompletionModel,
    StubCompletionModel,
    build_completion_model,
)
