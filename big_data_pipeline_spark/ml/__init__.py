"""Grouped model training (the reference's predict stage, Spark-native)."""
