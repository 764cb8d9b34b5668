from .flagship import flagship, FLAGSHIP_ORACLE

__all__ = ["flagship", "FLAGSHIP_ORACLE"]
