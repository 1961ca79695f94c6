from numba import List, typed

Dict = typed.Dict
