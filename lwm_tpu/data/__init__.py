from lwm_tpu.data.text import (
    DatasetFactory,
    HuggingfaceDataset,
    JsonDataset,
    TextProcessor,
)
