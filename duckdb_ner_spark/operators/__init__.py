# Import order registers declared queries (module import side effect).
from . import relational  # noqa: F401
