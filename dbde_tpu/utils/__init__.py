from .visualize import ascii_preview, write_pgm, read_pgm
