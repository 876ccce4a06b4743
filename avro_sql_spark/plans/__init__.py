from .fields import Field, SqlContext, parse
from .flatten import plan_flatten
from .structure import plan_withstructure

__all__ = ["Field", "SqlContext", "parse", "plan_flatten", "plan_withstructure"]
