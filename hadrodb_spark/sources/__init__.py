from hadrodb_spark.sources.collection import HadroCollection, HadroError

__all__ = ["HadroCollection", "HadroError"]
