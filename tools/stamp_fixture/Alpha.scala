// stamp fixture file A — content is arbitrary but FROZEN: both SrcStamp
// implementations hash this tree, and the committed .expected pins them
object Alpha { val x = 1 }
