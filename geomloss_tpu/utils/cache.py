"""Per-instance caching machinery for lazily-computed result attributes.

Re-implementation of the reference's ``_cache.py``
(``/root/reference/src/geomloss/_cache.py:4-91``): result objects such as
``OTResult`` expose expensive attributes (``plan``, ``value``,
``marginal_a``...) as immutable cached properties, computed on first
access. ``cache_clear`` resets them.
"""

import functools

__all__ = [
    "cache_clear",
    "immutable_cached_property",
    "add_cached_methods_to_sphinx",
    "cache_methods_and_properties",
]


def cache_clear(self):
    """Reset all cached methods and properties of an instance."""
    if hasattr(self, "_cached_methods"):
        for name in self._cached_methods:
            cached_method = getattr(self, name, None)
            if hasattr(cached_method, "cache_clear"):
                cached_method.cache_clear()

    if hasattr(self, "_cached_properties"):
        for name in self._cached_properties:
            if hasattr(self, "_cached_" + name):
                delattr(self, "_cached_" + name)


def immutable_cached_property(*, function, cache):
    """Like ``functools.cached_property`` but read-only and pytest-doc friendly."""

    def cached_func(self):
        if not cache:
            return function(self)
        attr = "_cached_" + function.__name__.lstrip("_")
        if not hasattr(self, attr):
            setattr(self, attr, function(self))
        return getattr(self, attr)

    cached_func.__doc__ = function.__doc__
    return property(cached_func)


def add_cached_methods_to_sphinx(cls):
    """Expose ``_name`` implementations as documented ``name`` properties."""
    for method_name in getattr(cls, "_cached_methods", ()):
        setattr(cls, method_name, getattr(cls, "_" + method_name))
    for method_name in getattr(cls, "_cached_properties", ()):
        setattr(cls, method_name, property(getattr(cls, "_" + method_name)))
    return cls


def cache_methods_and_properties(*, cls, instance, cache_size):
    """Install memoized versions of the ``_name`` implementations."""
    for method_name in getattr(instance, "_cached_methods", ()):
        setattr(
            instance,
            method_name,
            functools.lru_cache(maxsize=cache_size)(
                getattr(instance, "_" + method_name)
            ),
        )
    for method_name in getattr(instance, "_cached_properties", ()):
        setattr(
            cls,
            method_name,
            immutable_cached_property(
                function=getattr(cls, "_" + method_name),
                cache=cache_size != 0,
            ),
        )
