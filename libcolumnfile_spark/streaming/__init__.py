"""Structured Streaming surface (SURVEY.md §2.2 streaming row; reference
O23 is only appendable segments — watermarks/windows/state are the
standard-engine capabilities Spark supplies).
"""
