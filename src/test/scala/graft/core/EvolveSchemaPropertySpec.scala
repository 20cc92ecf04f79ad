package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.types._

/** Property coverage for the manifest lake's schema-evolution law —
  * the invariants a hand-picked case table can miss:
  *  1. identity: evolving a schema with itself is itself;
  *  2. field preservation: every committed field survives every
  *     accepted evolution, in its original position and type
  *     (readers of old files depend on this — a reorder or retype
  *     would silently reinterpret committed bytes);
  *  3. additivity: accepted evolution appends exactly the incoming
  *     fields that were new, in incoming order;
  *  4. monotone idempotence: evolving twice with the same incoming
  *     schema equals evolving once;
  *  5. soundness of rejection: evolution throws IFF some shared
  *     column name carries a different DataType.
  * Generated over random subsets/permutations of a type-diverse field
  * pool plus random type flips.
  */
class EvolveSchemaPropertySpec extends AnyFunSuite {

  private val types: Vector[DataType] = Vector(
    LongType, IntegerType, DoubleType, StringType, TimestampType,
    BooleanType, ArrayType(FloatType), DecimalType(12, 4))

  private val pool: Vector[String] =
    Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private def schemaGen: Gen[StructType] = for {
    names <- Gen.someOf(pool)
    shuffled <- Gen.const(scala.util.Random.shuffle(names.toVector))
    ts <- Gen.listOfN(shuffled.length, Gen.oneOf(types))
  } yield StructType(shuffled.zip(ts).map { case (n, t) => StructField(n, t) })

  private def run(prop: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, s"$name: $r")
  }

  test("identity and idempotence") {
    run(Prop.forAll(schemaGen) { sc =>
      val once = ManifestLake.evolveSchema(Some(sc), sc)
      once == sc && ManifestLake.evolveSchema(Some(once), sc) == once
    }, "identity")
  }

  test("accepted evolutions preserve committed fields in place and append the rest") {
    val compatiblePair: Gen[(StructType, StructType)] = for {
      committed <- schemaGen
      incoming <- schemaGen
    } yield {
      // make incoming type-compatible: shared names copy the committed type
      val byName = committed.fields.map(f => f.name -> f.dataType).toMap
      (committed, StructType(incoming.fields.map(f =>
        f.copy(dataType = byName.getOrElse(f.name, f.dataType)))))
    }
    run(Prop.forAll(compatiblePair) { case (committed, incoming) =>
      val out = ManifestLake.evolveSchema(Some(committed), incoming)
      val prefixHolds = out.fields.take(committed.fields.length)
        .sameElements(committed.fields)
      val newOnes = incoming.fields.filterNot(f =>
        committed.fieldNames.contains(f.name))
      val suffixHolds = out.fields.drop(committed.fields.length)
        .sameElements(newOnes)
      prefixHolds && suffixHolds
    }, "preservation+additivity")
  }

  /** Nullability RELAXES and never tightens: the committed flag is
    * bound into DSv2 codegen (UnsafeProjection skips the null check on
    * nullable=false), so a manifest that understates nullability after
    * a nullable append would read NULL slots as garbage zeros —
    * silently. Pinned: false∨true → true on shared names (deep, incl.
    * struct leaves), true never reverts to false, and ADDED columns
    * are nullable by construction (pre-add files null-fill them). */
  test("nullability relaxes, never tightens; added columns are always nullable") {
    val cNN = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("x", DoubleType, nullable = false))), nullable = false),
      StructField("arr", ArrayType(LongType, containsNull = false))))
    val iN = StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("s", StructType(Seq(
        StructField("x", DoubleType, nullable = true))), nullable = true),
      StructField("arr", ArrayType(LongType, containsNull = true)),
      StructField("fresh", StringType, nullable = false)))
    val out = ManifestLake.evolveSchema(Some(cNN), iN)
    assert(out("a").nullable, "top-level false∨true must relax")
    assert(out("s").nullable &&
      out("s").dataType.asInstanceOf[StructType]("x").nullable,
      "struct shells and leaves must relax")
    assert(out("arr").dataType.asInstanceOf[ArrayType].containsNull,
      "array element nullability must relax")
    assert(out("fresh").nullable,
      "an added column is nullable by construction — old files null-fill")
    // the reverse direction: a non-null append NEVER tightens
    val back = ManifestLake.evolveSchema(Some(out), cNN)
    assert(back("a").nullable && back("s").nullable &&
      back("arr").dataType.asInstanceOf[ArrayType].containsNull,
      "nullability must never tighten back")
  }

  test("rejects exactly the type flips") {
    val flippedPair: Gen[(StructType, StructType)] = for {
      committed <- schemaGen.suchThat(_.fields.nonEmpty)
      idx <- Gen.choose(0, committed.fields.length - 1)
      newType <- Gen.oneOf(types)
    } yield {
      val f = committed.fields(idx)
      (committed, StructType(Array(f.copy(dataType = newType))))
    }
    run(Prop.forAll(flippedPair) { case (committed, incoming) =>
      val flips = committed.fields.map(f => f.name -> f.dataType).toMap
        .get(incoming.fields.head.name)
        .exists(_ != incoming.fields.head.dataType)
      val threw =
        try { ManifestLake.evolveSchema(Some(committed), incoming); false }
        catch { case _: IllegalStateException => true }
      threw == flips
    }, "rejection-soundness")
  }
}
