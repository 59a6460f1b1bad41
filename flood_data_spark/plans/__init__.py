from flood_data_spark.plans.daily_pipeline import DailyForecastPipeline, DailyProducts

__all__ = ["DailyForecastPipeline", "DailyProducts"]
