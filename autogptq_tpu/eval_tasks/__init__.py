from .language_modeling_task import LanguageModelingTask
from .sequence_classification_task import SequenceClassificationTask
from .text_summarization_task import TextSummarizationTask

__all__ = [
    "LanguageModelingTask",
    "SequenceClassificationTask",
    "TextSummarizationTask",
]
