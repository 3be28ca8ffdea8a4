from .clean import CleanResult, clean_html
from .rules import DEFAULT_RULES, RuleConfig

__all__ = ["CleanResult", "clean_html", "DEFAULT_RULES", "RuleConfig"]
