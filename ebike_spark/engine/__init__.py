from ebike_spark.engine.engine import Engine, EngineResult
from ebike_spark.engine.errors import EbikeError

__all__ = ["Engine", "EngineResult", "EbikeError"]
