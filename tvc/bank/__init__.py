from tvc.bank.index import EmbeddingBank, topk_exact  # noqa: F401
from tvc.bank.store import ReferenceBank, ReferenceBankConfig, ReferenceItem  # noqa: F401
