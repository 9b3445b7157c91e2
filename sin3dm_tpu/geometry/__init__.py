from . import meshio, meshproc, native, uvatlas
