"""Relational + pipeline operators built on declarative DataFrame
plans. Nothing here collects to the driver; every operator returns a
DataFrame so Catalyst can fuse it into the surrounding plan.
"""
