// fixture file B in a nested dir — pins recursive walk + path-sorted order
object Beta { val über = "山☃" }
